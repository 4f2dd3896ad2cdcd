#!/bin/bash
# Complete suite, one process per test file.
#
# Why per-file: XLA:CPU executable deserialization segfaults after enough
# compiled/loaded executables accumulate in one process (jax 0.9.0;
# reproduced deterministically — see tests/test_dist.py docstring).  The
# default `pytest tests/` tier stays under that threshold; the full tier
# (-m '', including @slow cases) does not, so each file gets its own
# process.  Shares the persistent compile cache; exit code is non-zero if
# any file fails.
set -u
cd "$(dirname "$0")/.."
rc=0
for f in tests/test_*.py; do
  echo "=== $f"
  python -m pytest "$f" -q -m '' "$@" || rc=1
done
exit $rc
