#!/usr/bin/env bash
# Doc-reference check (VERDICT r18 wrong #1): scaladoc in main source keeps
# citing test suites by name, and three rounds running one of those names
# was stale (r16 StreamingOps, r17 CellCursor, r18 XxHash64Stream). This
# greps every `FooSpec` mention out of src/main and fails if no such suite
# file exists under src/test — wired into tools/pre-commit.sh so the rot
# can't land in a commit.
set -u
cd "$(git rev-parse --show-toplevel)" || exit 1
missing=0
for spec in $(grep -rhoE '\b[A-Z][A-Za-z0-9]+Spec\b' src/main/scala | sort -u); do
  # skip names that are main-source types (e.g. the TsAggSpec case class —
  # "Spec" as in aggregation specification, not a test suite)
  if grep -rqE "(class|trait|object) ${spec}\b" src/main/scala; then
    continue
  fi
  if ! find src/test -name "${spec}.scala" | grep -q .; then
    echo "[docrefs] main source cites '$spec' but src/test has no ${spec}.scala:" >&2
    grep -rn "\b${spec}\b" src/main/scala | head -3 >&2
    missing=1
  fi
done
if [ "$missing" = "0" ]; then
  echo "[docrefs] all spec names cited in main source exist under src/test." >&2
fi
exit $missing
