#!/bin/sh
# Pre-commit gate (r11, after the r7/r10 broken-snapshot incidents): a
# commit on main must COMPILE — main sources and test sources both. WIP
# belongs on a wip-* branch or in git stash, never in a main commit.
# Installed as .git/hooks/pre-commit (scripts/install_hooks.sh); kept in
# scripts/ so a fresh clone can re-install it.
#
# Fast path: sbt's incremental Test/compile is a no-op seconds when the
# tree is already built (the normal case right after a green test run).
# Bypass (emergencies only): git commit --no-verify.
set -e
cd "$(git rev-parse --show-toplevel)"
if ! sbt -batch "Test/compile" >/tmp/precommit_sbt.log 2>&1; then
  echo "pre-commit: Test/compile FAILED — refusing to commit." >&2
  tail -n 20 /tmp/precommit_sbt.log >&2
  exit 1
fi
