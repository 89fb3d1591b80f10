#!/usr/bin/env bash
# Idempotent: wire the tracked hooks into .git/hooks.
cd "$(git rev-parse --show-toplevel)" || exit 1
ln -sf ../../tools/pre-commit.sh .git/hooks/pre-commit
chmod +x tools/pre-commit.sh .git/hooks/pre-commit 2>/dev/null
echo "hooks installed: pre-commit -> tools/pre-commit.sh"
