#!/usr/bin/env bash
# Package crawlspark and run it via spark-submit --py-files — the shipping
# form mandated by BASELINE.json:14.  On a cluster, swap --master local[*]
# for your cluster master and size executors via --num-executors N / 4N to
# measure the scaling-efficiency criterion.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/crawlspark.zip

cd "$REPO"
rm -f "$ZIP"
python - <<'EOF'
import zipfile, pathlib
zf = zipfile.ZipFile("/tmp/crawlspark.zip", "w", zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path("crawlspark").rglob("*.py")):
    zf.write(p, p.as_posix())
zf.close()
print("packaged:", [i.filename for i in zipfile.ZipFile("/tmp/crawlspark.zip").infolist()][:3], "...")
EOF

STATE_DIR="${1:-/tmp/crawlspark-submit-state}"
rm -rf "$STATE_DIR"

exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/crawlspark/submit_job.py" \
  --state-dir "$STATE_DIR" --n-hotels "${N_HOTELS:-50}" --waves "${WAVES:-10}" \
  --seen-mode "${SEEN_MODE:-bloom}" --take-k "${TAKE_K:-500}"
