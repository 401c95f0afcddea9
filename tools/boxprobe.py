"""One-number host-speed probe (no Spark): hashes a fixed buffer and
prints seconds — ~0.25 s on this box unthrottled; 2-10x that inside a
host-throttle window. Run before/around timing sessions so a reading
can be certified against the same floor bench.py's canary uses.

Usage: python3 tools/boxprobe.py [reps]
"""

import hashlib
import sys
import time

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
buf = b"x" * (1 << 22)
for _ in range(reps):
    t0 = time.time()
    h = hashlib.sha256()
    for _ in range(64):
        h.update(buf)
    print(f"{time.time() - t0:.3f}", flush=True)
