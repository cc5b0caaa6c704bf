"""Model/tensor inspection utilities (reference ``utils_luo/tools.py``:
``count_parameters:2691``, ``compute_model_size:2685`` (thop FLOPs),
``check_tensor:2709`` / ``check_tensor_np:2727`` — the debug stat printers
used throughout the reference's demos and train summaries).

The FLOPs counter uses XLA's compiled cost analysis instead of thop — the
number reflects the program the TPU actually runs (post-fusion)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def count_parameters(variables) -> int:
    """Total parameter count of a flax variables dict (or params pytree)
    (reference ``count_parameters``, ``train_mvsec.py:185-195`` summary)."""
    import jax

    tree = variables.get("params", variables) if isinstance(variables, dict) else variables
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree)))


def compute_model_flops(fn, *args) -> dict:
    """XLA cost analysis of ``jax.jit(fn)(*args)`` → {'gflops',
    'bytes_accessed'} (reference ``compute_model_size`` prints thop GFLOPs;
    get param counts from :func:`count_parameters`)."""
    import jax

    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return {"gflops": flops / 1e9, "bytes_accessed": cost.get("bytes accessed", 0.0)}


def check_tensor(data, name: str, print_data: bool = False,
                 print_in_txt=None) -> str:
    """Shape/dtype/max/min/mean/sum one-liner for any array (device or
    numpy) — the reference's ubiquitous debug printer."""
    temp = np.asarray(data)
    name_ = (name + " " * 100)[: max(len(name), 10)]
    print_str = (
        f"{name_}, {temp.shape}, {temp.dtype},  max:{temp.max():.2f},"
        f" min:{temp.min():.2f}, mean:{temp.mean():.2f}, sum:{temp.sum():.2f}"
    )
    if print_in_txt is None:
        print(print_str)
    else:
        print(print_str, file=print_in_txt)
    if print_data:
        print(temp)
    return print_str


def im_norm(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to uint8 [0,255] (reference ``im_norm:2697``)."""
    img = np.asarray(img, np.float64)
    lo, hi = img.min(), img.max()
    img = (img - lo) / max(hi - lo, 1e-6)
    return (img * 255).astype(np.uint8)
