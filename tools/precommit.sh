#!/usr/bin/env bash
# Pre-commit guard: never commit a snapshot that doesn't compile.
# Usage: tools/precommit.sh [--full]
#   default: sbt compile Test/compile   (~seconds, catches round-2's failure mode)
#   --full:  also runs the ScalaTest suite
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ "${1:-}" == "--full" ]]; then
  sbt -batch compile Test/compile test
else
  sbt -batch compile Test/compile
fi
echo "precommit: OK"
