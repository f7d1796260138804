"""Process-level utilities (reference: utils/general_utils.py:112-133)."""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


class _TimestampedStdout:
    """stdout wrapper stamping each line (reference:
    utils/general_utils.py:114-127)."""

    def __init__(self, old, silent: bool):
        self.old = old
        self.silent = silent

    def write(self, x: str) -> None:
        if self.silent:
            return
        if x.endswith("\n"):
            stamp = datetime.now().strftime("%d/%m %H:%M:%S")
            self.old.write(x.replace("\n", f" [{stamp}]\n"))
        else:
            self.old.write(x)

    def flush(self) -> None:
        self.old.flush()


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Seed host RNGs and optionally silence/timestamp stdout. The
    reference also pins cuda:0 here (utils/general_utils.py:133); device
    selection in gsjax is JAX's job."""
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)


def enable_compile_cache(
    path: str = "/root/repo/.jax_compile_cache",
    min_compile_secs: float = 5.0,
) -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Remote compiles over the tunneled-TPU link cost minutes each; the
    persistent cache makes every rerun of a bench/tool hit the disk cache
    instead. Call BEFORE the first compilation (backend init is fine).
    No reference analog — torch/CUDA kernels are precompiled; XLA's are
    per-program."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
