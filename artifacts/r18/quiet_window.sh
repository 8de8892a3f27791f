#!/bin/bash
# Quiet-window artifact cutter (r17, verdict item 1): waits for host load1
# below the threshold BEFORE EACH PHASE, runs the phase, and retries it
# (up to 3x) if the 1-min load at phase end shows co-tenant pollution —
# the r16 lesson: numerator and denominator of the bench ratio must come
# from the same load regime, and one-shot gating only protects the start.
#   tools/quiet_window.sh [threshold] [phases]
# phases: comma list of oracle,bench,sweeps,spab (default oracle,bench,sweeps)
set -u
THRESH=${1:-1.0}
PHASES=${2:-oracle,bench,sweeps}
LOG=/tmp/quiet_window_r17.log
SQL=/tmp/gv_full_r17/oracle_sql.json

load1() { cut -d' ' -f1 /proc/loadavg; }
stamp() { echo "[$(date +%H:%M:%S) load=$(load1)] $*" | tee -a "$LOG"; }

wait_quiet() {
  while :; do
    L=$(load1)
    awk -v l="$L" -v t="$THRESH" 'BEGIN{exit !(l<t)}' && break
    sleep 60
  done
}

# run_phase <name> <max_end_load> <cmd...>: wait for quiet, run, retry on
# end-load pollution (our own run contributes ~2-4 to load1 on 32 cores,
# so the bound is generous but catches co-tenant arrival)
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

phase_oracle() {
  python3 tools/oracle_bench.py /root/testdata/sf0.1 "$SQL" ORACLE_BENCH.json \
    >> "$LOG" 2>&1
  stamp "oracle total: $(python3 -c "import json;d=json.load(open('ORACLE_BENCH.json'));print(d.get('total_s'))")"
}

phase_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch 'runMain graft.Bench' \
    2>&1 | grep '"metric"' | sed 's/^\[info\] //' > BENCH_quiet_r17.json
  stamp "bench: $(python3 -c "import json;d=json.load(open('BENCH_quiet_r17.json'));print(f\"{d['value']:.2f}s ratio={d.get('ratio')} load={d['load1_start']}->{d['load1_end']}\")")"
}

phase_sweeps() {
  GATES=q244_curation_pipeline,q210_rec_mrr,q205_er_clusters,q21_embed_neardup,q253_winnow_ingest,q254_bm25_indexed,q134_communities
  sbt -batch "runMain graft.tools.ScaleSweep /root/testdata/sf0.1 $GATES" \
    2>&1 | grep SWEEP > SWEEP_sf01_r17.txt
  sbt -batch "runMain graft.tools.ScaleSweep /tmp/graft_sf1 $GATES" \
    2>&1 | grep SWEEP > SWEEP_sf1_r17.txt
  stamp "sweeps written"
}

phase_spab() {
  SUBSET=q10_filter_project,q51_stratified_sample,q101_ivf_ingest,q224_weighted_sample,q233_hill,q19_lang_profile,q46_pagination,q16_dedup_exact,q36_string_funcs,q5_anti_join,q99_kll_quantiles,q2_topk_revenue,q134_communities,q249_split_leakage,q215_pagerank,q201_poisson_bootstrap,q205_er_clusters,q21_embed_neardup
  for SP in 8 16 8 16; do
    stamp "spab GRAFT_SHUFFLE_PARTITIONS=$SP"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=$SUBSET \
      GRAFT_SHUFFLE_PARTITIONS=$SP sbt -batch 'runMain graft.Bench' \
      2>&1 | grep '"metric"' | sed 's/^\[info\] //' >> /tmp/spab_r17.jsonl
  done
}

case ",$PHASES," in *,oracle,*) run_phase oracle 4.0 phase_oracle ;; esac
case ",$PHASES," in *,bench,*)  run_phase bench  5.0 phase_bench  ;; esac
case ",$PHASES," in *,sweeps,*) run_phase sweeps 5.0 phase_sweeps ;; esac
case ",$PHASES," in *,spab,*)   run_phase spab   5.0 phase_spab   ;; esac

stamp "all phases complete"
