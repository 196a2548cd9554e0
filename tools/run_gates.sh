#!/usr/bin/env bash
# Run every gate the driver/judge cares about, in order.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate (sf0.01) =="
python tools/check_oracle.py

echo "== bench (sf0.1) =="
python bench.py

echo "== plan audit =="
python tools/explain_audit.py > PLANS_AUDIT.md
echo "PLANS_AUDIT.md refreshed"

echo "== query index =="
python tools/gen_queries_md.py > QUERIES.md
echo "QUERIES.md refreshed"
