#!/usr/bin/env bash
# Multi-process writer stress for the versioned lake commit protocol.
# Usage: scripts/stress_writers.sh [workDir] [writers] [appendsPerWriter]
set -euo pipefail
cd "$(dirname "$0")/.."
DIR="${1:-/tmp/graft-stress}"
WRITERS="${2:-3}"
APPENDS="${3:-20}"
rm -rf "$DIR"
exec sbt -batch "runMain graft.LakeStress $DIR $WRITERS $APPENDS"
