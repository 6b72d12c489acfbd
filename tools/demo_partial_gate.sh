#!/usr/bin/env bash
# Demonstrates the r13 gate-hardening contract: a correctness run
# killed mid-flight (SIGKILL to the whole process group, no shutdown
# hooks) leaves parseable partial records — oracle_sql.json (written
# FIRST, before any query runs) plus one flushed results.jsonl row per
# query that landed. The r11/r12 driver gates both recorded {} because
# nothing durable existed until the whole pass finished; this script is
# the regression demonstration for the fix.
#
# The sbt launcher and the forked Verify JVM are killed together via a
# setsid-created process group — killing only the sbt wrapper lets the
# forked JVM escape and finish the run, which is exactly the
# non-partial outcome this demo must not accept.
#
# Usage: tools/demo_partial_gate.sh   (from the repo root; ~90 s)
set -u
OUT=/tmp/partial_gate_demo
rm -rf "$OUT"
rm -f /tmp/partial_gate_demo.log

setsid bash -c \
  'exec sbt -batch "runMain graft.Verify /root/testdata/sf0.01 '"$OUT"'"' \
  > /tmp/partial_gate_demo.log 2>&1 &
LEADER=$!   # setsid ⇒ group leader ⇒ PGID == this PID

# wait for some (not all) queries to land, then SIGKILL the entire
# group — sbt wrapper AND the forked JVM — the harshest interruption
for _ in $(seq 1 180); do
  [ -f "$OUT/results.jsonl" ] && \
    [ "$(wc -l < "$OUT/results.jsonl")" -ge 25 ] && break
  sleep 1
done
kill -9 -- "-$LEADER" 2>/dev/null
wait "$LEADER" 2>/dev/null
sleep 2
# belt and braces: nothing from this run may survive
pkill -9 -f "graft.Verify /root/testdata/sf0.01 $OUT" 2>/dev/null
sleep 1

python3 - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
rows = [json.loads(l) for l in open(os.path.join(out, "results.jsonl"))]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
n_total = len(oracle)
assert rows, "no results.jsonl rows survived the kill"
assert 0 < len(rows) < n_total, \
    f"expected a PARTIAL record, got {len(rows)}/{n_total}"
ok = sum(1 for r in rows if r["ok"])
print(f"PASS: kill -9 mid-run left {len(rows)}/{n_total} parseable "
      f"result rows ({ok} ok), oracle_sql.json complete with "
      f"{n_total} entries — a killed driver gate yields honest "
      f"partial red/green rows instead of {{}}")
EOF
