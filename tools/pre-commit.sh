#!/usr/bin/env bash
# Snapshot guard (VERDICT r11 "what's wrong" #3 / next #6): refuse any
# commit that stages Scala source which does not pass `sbt Test/compile`.
# Round 11 ended with an uncompilable snapshot commit that zeroed the
# round's CORRECTNESS and BENCH artifacts; this makes that mechanically
# impossible rather than a matter of discipline.
#
# Install (done by tools/install-hooks.sh, idempotent):
#   ln -sf ../../tools/pre-commit.sh .git/hooks/pre-commit
#
# Escape hatch for non-code emergencies only: GRAFT_SKIP_COMPILE_GUARD=1.
set -u
if [ "${GRAFT_SKIP_COMPILE_GUARD:-0}" = "1" ]; then
  echo "[pre-commit] compile guard SKIPPED by GRAFT_SKIP_COMPILE_GUARD=1" >&2
  exit 0
fi
# Only gate commits that actually touch Scala/sbt sources.
if ! git diff --cached --name-only | grep -qE '\.(scala|sbt)$'; then
  exit 0
fi
echo "[pre-commit] staged Scala/sbt changes — running sbt Test/compile ..." >&2
cd "$(git rev-parse --show-toplevel)" || exit 1
if ! sbt -batch Test/compile >/tmp/precommit_compile.log 2>&1; then
  echo "[pre-commit] REFUSED: sbt Test/compile failed — the snapshot must build." >&2
  tail -n 30 /tmp/precommit_compile.log >&2
  exit 1
fi
echo "[pre-commit] compile green." >&2
exit 0
