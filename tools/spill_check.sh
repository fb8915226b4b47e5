#!/usr/bin/env bash
# Spill gracefulness gate: run graft.SpillProbe with an ample heap and
# a deliberately capped heap, assert (1) no OOM, (2) every query's
# result checksum is IDENTICAL across the two runs (spill never changes
# an answer), (3) the capped run actually spilled (the path was
# exercised, not dodged). Writes the combined artifact to $3
# (default SPILLPROBE_r10.json).
set -euo pipefail
cd "$(dirname "$0")/.."
AMPLE="${1:-8g}"
CAPPED="${2:-1500m}"
OUT="${3:-SPILLPROBE_r10.json}"

run() {
  SPARK_DRIVER_MEM="$1" sbt -batch "runMain graft.SpillProbe" 2>&1 \
    | grep -m1 '"metric":"spill_probe"' | sed 's/^\[info\] //'
}

echo "[spill_check] ample-heap run ($AMPLE)..."
A=$(run "$AMPLE")
echo "[spill_check] capped-heap run ($CAPPED)..."
B=$(run "$CAPPED")

python3 - "$A" "$B" "$OUT" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
qa = {q["query"]: q for q in a["queries"]}
qb = {q["query"]: q for q in b["queries"]}
assert qa.keys() == qb.keys(), (qa.keys(), qb.keys())
for name in qa:
    assert qa[name]["checksum"] == qb[name]["checksum"], \
        f"{name}: capped-heap answer DIFFERS (checksum mismatch)"
    assert qa[name]["rows"] == qb[name]["rows"], name
spilled = sum(q["mem_spill_bytes"] + q["disk_spill_bytes"]
              for q in qb.values())
assert spilled > 0, "capped run never spilled - cap lower to exercise it"
json.dump({"metric": "spill_check", "ample": a, "capped": b,
           "capped_total_spill_bytes": spilled,
           "checksums_match": True}, open(sys.argv[3], "w"), indent=1)
print(f"[spill_check] OK: answers identical, capped run spilled "
      f"{spilled/1e6:.0f} MB -> {sys.argv[3]}")
EOF
