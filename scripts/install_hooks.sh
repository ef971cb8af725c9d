#!/bin/bash
# Symlink the tracked git hooks into .git/hooks (hooks are not cloned;
# run once per checkout — regenerate_evidence.sh also calls this).
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
mkdir -p .git/hooks
for h in scripts/hooks/*; do
  ln -sf "../../$h" ".git/hooks/$(basename "$h")"
done
chmod +x scripts/hooks/*
echo "installed: $(ls scripts/hooks/)"
