#!/usr/bin/env bash
# Round-close artifact commit (r14 verdict item 2, recurring hygiene).
#
# WHY: two rounds running, the driver-final `bench_full.json` sat
# modified-uncommitted and the round's BENCH_r{N}.json /
# CORRECTNESS_r{N}.json untracked at judging time. bench.py rewrites
# bench_full.json unconditionally on every run, so "rerun for a cleaner
# number" silently overwrites the artifact the round's BENCH_r{N}
# actually recorded — commit first, rerun after.
#
# WHEN: (a) immediately after any bench run worth keeping, and
# (b) as the LAST step of a build round, after the final pytest/bench.
# The next round's first action should also run it, catching anything
# the driver wrote after the builder's last commit.
set -euo pipefail
cd "$(dirname "$0")/.."
# Add each pathspec individually: the always-present artifacts must
# surface real git errors (held index.lock, permissions) instead of
# being silenced into a false "nothing to do" (r15 ADVICE); only the
# legitimately-optional pathspecs (round-numbered globs / files that
# may not exist yet this round) get the || true escape, and only for
# the "did not match any files" case which git reports on stderr.
git add -A -- bench_full.json
for optional in 'BENCH_r*.json' 'CORRECTNESS_r*.json' VERDICT.md ADVICE.md; do
    git add -A -- "$optional" || true
done
if git diff --cached --quiet; then
    echo "round_close: artifacts already committed, nothing to do"
else
    git commit -m "Commit round artifacts (bench/correctness/verdict)"
    echo "round_close: committed"
fi
