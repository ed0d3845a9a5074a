"""Background memory tracker (reference upcxx-utils mem_profile.cpp:74-143).

Samples free memory from /proc/meminfo on a thread and logs swings larger
than a threshold to a tracker file, like the reference's MemoryTrackerThread.
"""

from __future__ import annotations

import threading
import time


def get_free_mem_bytes() -> int:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable:"):
                return int(line.split()[1]) * 1024
    return 0


def get_free_device_mem_bytes() -> int:
    """Free bytes on the default accelerator (HBM), 0 if unknown/CPU.

    The memory that actually bounds the counting pipeline on TPU is device
    HBM, not host RAM (the reference sizes its GPU hash table from device
    memory the same way, kcount_gpu.cpp:175-196)."""
    import jax

    d = jax.devices()[0]
    if d.platform == "cpu":
        return 0
    try:
        st = d.memory_stats()
        return int(st["bytes_limit"]) - int(st.get("bytes_in_use", 0))
    except Exception:
        pass
    if d.platform == "tpu":
        # stats unavailable through the remote-tunnel PJRT plugin: assume a
        # v5e-class 16 GiB chip rather than pretending memory is unbounded
        return 16 << 30
    return 0


class MemoryTracker:
    def __init__(self, log_path: str, interval_s: float = 2.0, swing_bytes: int = 1 << 30):
        self.log_path = log_path
        self.interval_s = interval_s
        self.swing_bytes = swing_bytes
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self):
        last = get_free_mem_bytes()
        with open(self.log_path, "a") as f:
            f.write(f"{time.time():.1f} start free={last}\n")
            f.flush()
            while not self._stop.wait(self.interval_s):
                cur = get_free_mem_bytes()
                if abs(cur - last) >= self.swing_bytes:
                    f.write(f"{time.time():.1f} free={cur} delta={cur - last}\n")
                    f.flush()
                    last = cur
            f.write(f"{time.time():.1f} stop free={get_free_mem_bytes()}\n")

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
