import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
from bench import bench_extraction_device, bench_extraction_host
t0=time.perf_counter(); dev = bench_extraction_device(512); t1=time.perf_counter()
print(f"device fused 512-window batch: {dev:.1f} windows/s (bench took {t1-t0:.1f}s incl compile)")
host = bench_extraction_host(24)
print(f"host python path: {host:.2f} windows/s")
print(f"speedup: {dev/host:.1f}x")
