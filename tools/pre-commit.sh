#!/usr/bin/env bash
# Snapshot guard (VERDICT r11 "what's wrong" #3; extended per VERDICT r12
# next #2): refuse any commit that stages Scala source which does not pass
# `sbt Test/compile`, AND — when test sources are staged — run those staged
# suites, because r12's failure mode was a snapshot commit whose new spec
# compiled but had never been executed.
#
# Install (done by tools/install-hooks.sh, idempotent):
#   ln -sf ../../tools/pre-commit.sh .git/hooks/pre-commit
#
# Known caveat (ADVICE r12): the guard compiles/tests the WORKING TREE, not
# the staged index — a partially-staged commit can diverge from what is
# verified. We accept this: the round workflow commits whole files, and a
# worktree checkout per commit would double every commit's latency.
#
# Escape hatch for non-code emergencies only: GRAFT_SKIP_COMPILE_GUARD=1
# (skips everything) / GRAFT_SKIP_TEST_GUARD=1 (skips only the test run).
set -u
if [ "${GRAFT_SKIP_COMPILE_GUARD:-0}" = "1" ]; then
  echo "[pre-commit] guard SKIPPED by GRAFT_SKIP_COMPILE_GUARD=1" >&2
  exit 0
fi
# Only gate commits that actually touch Scala/sbt sources.
if ! git diff --cached --name-only | grep -qE '\.(scala|sbt)$'; then
  exit 0
fi
echo "[pre-commit] staged Scala/sbt changes — running sbt Test/compile ..." >&2
cd "$(git rev-parse --show-toplevel)" || exit 1
# Doc-reference rot guard (VERDICT r18 wrong #1, three rounds running):
# every `FooSpec` a main-source comment cites must exist under src/test.
if ! tools/docrefs.sh; then
  echo "[pre-commit] REFUSED: stale spec name cited in main source (see above)." >&2
  exit 1
fi
if ! sbt -batch Test/compile >/tmp/precommit_compile.log 2>&1; then
  echo "[pre-commit] REFUSED: sbt Test/compile failed — the snapshot must build." >&2
  tail -n 30 /tmp/precommit_compile.log >&2
  exit 1
fi
echo "[pre-commit] compile green." >&2
# Staged test suites must PASS, not just compile (r12 shipped a red test).
if [ "${GRAFT_SKIP_TEST_GUARD:-0}" = "1" ]; then
  echo "[pre-commit] test guard SKIPPED by GRAFT_SKIP_TEST_GUARD=1" >&2
  exit 0
fi
# Map staged spec files to fully-qualified suite names (package graft, flat).
SUITES=$(git diff --cached --name-only --diff-filter=ACMR \
  | grep -E '^src/test/scala/.*Spec\.scala$' \
  | sed -E 's#^src/test/scala/##; s#/#.#g; s#\.scala$##' || true)
if [ -z "$SUITES" ]; then
  exit 0
fi
echo "[pre-commit] staged test suites — running: $SUITES" >&2
# shellcheck disable=SC2086
if ! sbt -batch "testOnly $(echo $SUITES | tr '\n' ' ')" >/tmp/precommit_test.log 2>&1; then
  echo "[pre-commit] REFUSED: staged test suites failed — run them before committing." >&2
  tail -n 40 /tmp/precommit_test.log >&2
  exit 1
fi
echo "[pre-commit] staged suites green." >&2
exit 0
