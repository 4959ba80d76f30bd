#!/bin/sh
# Install the repo's git hooks (currently just the pre-commit compile
# gate). Run once per clone: sh scripts/install_hooks.sh
set -e
cd "$(git rev-parse --show-toplevel)"
cp scripts/precommit.sh .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit (Test/compile gate)"
