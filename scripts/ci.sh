#!/usr/bin/env bash
# Tiered test runner (VERDICT #10: the reference-tolerance oracle families must run
# somewhere routinely, not only behind -m slow by hand).
#
#   scripts/ci.sh fast    — the default suite (pytest.ini deselects slow), ~20 min CPU
#   scripts/ci.sh slow    — the full-resolution oracle tier: thin-shell scipy-parity
#                           bowls/plates, full-res bar closed forms (~40 min CPU)
#   scripts/ci.sh corpus  — regenerate render goldens + tet corpus snapshot and fail
#                           on git diff (the committed-artifact oracles)
#   scripts/ci.sh all     — everything above in order
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-fast}"

run_fast()   { python -m pytest tests/ -q; }
run_slow()   { python -m pytest tests/ -m slow -q; }
run_corpus() {
  python scripts/render_corpus.py
  git diff --exit-code -- tests/fixtures/render_corpus \
    || { echo "render corpus drifted — commit intentional changes"; exit 1; }
}

case "$tier" in
  fast)   run_fast ;;
  slow)   run_slow ;;
  corpus) run_corpus ;;
  all)    run_fast; run_slow; run_corpus ;;
  *) echo "usage: scripts/ci.sh [fast|slow|corpus|all]"; exit 2 ;;
esac
