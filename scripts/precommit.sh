#!/bin/sh
# Pre-commit smoke: the JVM-free classifier checks (<2 s).  Round-5
# post-mortem: a snapshot commit with an unresolved name in the matcher
# library silently broke ALL classification; these tests execute every
# matcher body without Spark, so that class of breakage fails the commit.
# Install:  ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
set -e
cd "$(git rev-parse --show-toplevel)"
# + the query-registry contract (imports, 85+ specs, oracles present,
# rotation names resolve) — a broken registration otherwise only
# surfaces at driver time
exec python -m pytest tests/test_classifier_smoke.py \
  tests/test_registry_sanity.py -q -x --no-header -p no:cacheprovider
