#!/bin/bash
# Kill-and-resume soak (VERDICT r14 #3): run the CC star loop under a
# reliable checkpoint dir, HARD-KILL the JVM (Runtime.halt, no hooks)
# right after round 3's durable state commit, resume from the committed
# round state in a fresh JVM, and require the resumed output hash to
# equal an uninterrupted run's. See graft.SoakResume.
set -u
cd "$(dirname "$0")/.."
DIR=/tmp/graft-soak-resume
rm -rf "$DIR" /tmp/graft-soak-ckpt
echo "[soak] crash run (halt after round 3)..."
sbt -batch "runMain graft.SoakResume crash $DIR 3"
echo "[soak] crash run exit code: $? (nonzero expected — the JVM was halted)"
OUT_R=$(sbt -batch "runMain graft.SoakResume resume $DIR" | grep -o 'SOAK [a-z-]*[ =][a-z0-9=]*')
OUT_C=$(sbt -batch "runMain graft.SoakResume clean" | grep -o 'SOAK clean hash=[0-9a-f]*')
R=$(echo "$OUT_R" | grep -o 'hash=[0-9a-f]*' | cut -d= -f2)
AT=$(echo "$OUT_R" | grep -o 'resumed-at=[0-9]*' | cut -d= -f2)
C=$(echo "$OUT_C" | grep -o 'hash=[0-9a-f]*' | cut -d= -f2)
echo "[soak] resumed-at=$AT resume_hash=$R clean_hash=$C"
if [ -n "$R" ] && [ "$R" = "$C" ] && [ -n "$AT" ] && [ "$AT" -ge 4 ]; then
  echo "[soak] PASS: resumed at round $AT (>= 4) with an identical output hash"
else
  echo "[soak] FAIL"
  exit 1
fi
