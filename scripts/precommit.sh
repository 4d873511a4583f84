#!/bin/sh
# Pre-commit smoke: the JVM-free classifier checks (<2 s).  Round-5
# post-mortem: a snapshot commit with an unresolved name in the matcher
# library silently broke ALL classification; these tests execute every
# matcher body without Spark, so that class of breakage fails the commit.
# Install:  ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
set -e
cd "$(git rev-parse --show-toplevel)"
exec python -m pytest tests/test_classifier_smoke.py -q -x --no-header -p no:cacheprovider
