#!/usr/bin/env bash
# Interleaved micro A/B on a query subset: cur, base, cur, base, … each a
# fresh raw-java JVM (no sbt); per-query MIN per side; prints ratios.
# Usage: tools/micro_ab.sh <namePrefix,...> [rounds=3]
# Requires /tmp/graft_cp.txt (current) and /tmp/graft_cp_base.txt (baseline).
set -euo pipefail
PREFIX=${1:?usage: micro_ab.sh <namePrefix,...> [rounds]}
ROUNDS=${2:-3}
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { # cp-file out-file
  java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$(cat "$1")" graft.MicroBench "$PREFIX" 2>/dev/null \
    | grep '^{"metric"' > "$2"
}
for i in $(seq 1 "$ROUNDS"); do
  echo "[ab] round $i/$ROUNDS cur  $(date +%H:%M:%S)" >&2
  run /tmp/graft_cp.txt "/tmp/mab_cur_$i.json"
  echo "[ab] round $i/$ROUNDS base $(date +%H:%M:%S)" >&2
  run /tmp/graft_cp_base.txt "/tmp/mab_base_$i.json"
done
python3 - "$ROUNDS" <<'EOF'
import json, sys
rounds = int(sys.argv[1])
cur  = [json.load(open(f"/tmp/mab_cur_{i}.json"))["queries"] for i in range(1, rounds+1)]
base = [json.load(open(f"/tmp/mab_base_{i}.json"))["queries"] for i in range(1, rounds+1)]
keys = sorted(cur[0].keys())
tc = tb = 0.0
for k in keys:
    c = min(r[k] for r in cur); b = min(r[k] for r in base)
    tc += c; tb += b
    print(f"{b:8.2f} -> {c:8.2f}  x{c/b if b>0 else float('nan'):.3f}  {k}")
print(f"total  {tb:.2f} -> {tc:.2f}  x{tc/tb:.3f}")
EOF
