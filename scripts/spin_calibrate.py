#!/usr/bin/env python3
"""Fixed-work single-thread CPU spin for bench-window calibration.

The sandbox hypervisor starves guest CPU unpredictably (BASELINE.md:
identical binaries measured 129.9 s .. 3699.9 s). Run this immediately
before an official bench: the wall time of a fixed CPU-bound loop tells you
how starved the window is. Record the spin seconds next to every official
bench total. Reference (quiet window, round 8, load avg < 1): ~4.5 s.
A spin >= 2x the
reference means re-run later; timings from that window are untrustworthy.
"""
import time

t0 = time.perf_counter()
acc = 0
for i in range(30_000_000):
    acc = (acc + i * i) % 1_000_003
dt = time.perf_counter() - t0
print(f"spin_seconds={dt:.2f} acc={acc}")
