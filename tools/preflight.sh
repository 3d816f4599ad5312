#!/usr/bin/env bash
# End-of-round preflight (r4 verdict #2): the ~3-minute gate battery
# that caught rounds 2-4's buzzer-beater regressions — run it before
# EVERY snapshot/commit that touches the registry, and as the LAST
# step of every round. A red here means the round's strongest claim
# ("all queries green, artifact in sync") ships broken.
#
# Usage: tools/preflight.sh [extra pytest args]
#   - artifact gates: committed CORRECTNESS_full_r{N}.json == registry
#     == SURVEY §2 (test_artifacts.py)
#   - plan gates: window grain audit, broadcast/cartesian/pushdown
#     gates (test_plan_quality.py)
#   - fast compile check of the registry (all builders import + build)
#     is implied by the plan gates walking every registered query.
#
# After ANY registry change also regenerate the sweep artifact first:
#   DRIVER_SIM_OUT=CORRECTNESS_full_r{N}.json python tools/driver_sim.py
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/test_artifacts.py tests/test_plan_quality.py -q "$@"
