#!/bin/bash
# Full-registry sf0.1 oracle record at one HEAD (r14 verdict item 1).
#
# The r14 sweep ran check_oracle serially in alphabetical order and the
# round ended inside m09's recursive-CTE oracle with the whole q/s/t
# tail unchecked. This runner splits the registry into FOUR concurrent
# DuckDB checkers — the three known grinders (d14, d35, m09: recursive
# transitive-closure CTEs over quadratic pair sets) each get their own
# process, everything else runs in a fourth — then merges the PASS/FAIL
# lines sorted. Wall time = max(grinder), not sum.
#
# Usage: tools/oracle_sf01.sh <round-tag e.g. r15> [verifyOut]
set -e
cd /root/repo
R=${1:?round tag}
OUT=${2:-/tmp/verify_sf01_$R}
SF=/root/testdata/sf0.1

# never contend with a live bench window (r15 verdict item 5): the
# driver's BENCH_r{N}.json is the number in the record, and r15's
# headline carried this script's m09 grind
while pgrep -f 'graft\.Bench' >/dev/null 2>&1; do
  echo "=== bench JVM alive; oracle record waits: $(date)"; sleep 30
done

# the record is one-HEAD by definition: a verify dir left by an earlier
# HEAD must not silently mix old engine dumps into it (r15 advisor)
HEAD_NOW=$(git rev-parse HEAD)
if [ -f "$OUT/oracle_sql.json" ] && [ "$(cat "$OUT/_HEAD" 2>/dev/null)" != "$HEAD_NOW" ]; then
  echo "=== stale verify dir (HEAD mismatch) — regenerating: $OUT"
  rm -rf "$OUT"
fi
if [ ! -f "$OUT/oracle_sql.json" ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF $OUT"
  echo "$HEAD_NOW" > "$OUT/_HEAD"
fi
# re-derive the trained-constant oracles (k-means books, rotations,
# BPE merges, d26 prefix bits) for THIS corpus, in place
python3 tools/patch_oracle_scale.py "$SF" "$OUT" "$OUT/oracle_sql.json"

# hardlink split: each subset dir sees only its queries' outputs plus
# the full patched oracle json (--subset skips missing outputs)
split() { # name queries...
  local d="$OUT-$1"; shift
  rm -rf "$d"; mkdir -p "$d"
  cp "$OUT/oracle_sql.json" "$d/"
  for q in "$@"; do
    if [ -e "$OUT/$q" ]; then cp -al "$OUT/$q" "$d/$q"; fi
  done
}
GRINDERS="d14_dedup_clusters d35_quality_keeper m09_multimodal_clusters d42_dupheavy_report d43_dupheavy_clusters"
split g1 d14_dedup_clusters
split g2 d35_quality_keeper
# m09 is contracted since r16 (local-minima closure, ~10 min, was ~75);
# it shares a process with the two dup-heavy oracles, whose quadratic
# rep Jaccard is the same ~10-min shape
split g3 m09_multimodal_clusters d42_dupheavy_report d43_dupheavy_clusters
rm -rf "$OUT-rest"; mkdir -p "$OUT-rest"
cp "$OUT/oracle_sql.json" "$OUT-rest/"
for q in "$OUT"/*/; do
  b=$(basename "$q")
  case " $GRINDERS " in *" $b "*) ;; *) cp -al "$OUT/$b" "$OUT-rest/$b";; esac
done

for part in rest g1 g2 g3; do
  (python3 tools/check_oracle.py "$SF" "$OUT-$part" --subset \
     > "/tmp/oracle_${R}_$part.log" 2>&1; \
   echo "=== $part done: $(date)") &
done
wait
grep -h -E '^(PASS|FAIL)' /tmp/oracle_${R}_rest.log /tmp/oracle_${R}_g1.log \
  /tmp/oracle_${R}_g2.log /tmp/oracle_${R}_g3.log | sort -k2 \
  > bench_runs/oracle_sf01_${R}.txt
echo "=== RECORD: $(grep -c '^PASS' bench_runs/oracle_sf01_${R}.txt) PASS, \
$(grep -c '^FAIL' bench_runs/oracle_sf01_${R}.txt || true) FAIL"
