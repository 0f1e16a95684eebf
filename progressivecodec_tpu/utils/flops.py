"""Analytic FLOP accounting + MFU (VERDICT round-3 next #2).

Counts MXU FLOPs (convolutions + dot_generals) by traversing the jaxpr
of a function at concrete shapes — exact, analytic, and independent of
any profiler.  Elementwise VPU work is excluded by design: MFU is
conventionally model FLOPs / (time x matmul peak), per the public
scaling-book methodology.

`chip_peak_flops` maps the attached chip to its published dense peak so
bench.py can report `mfu = flops / (step_time * peak)`.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def _conv_flops(eqn) -> int:
    """2 * |out| * kh * kw * (Cin / feature_groups) for NHWC/HWIO convs."""
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # kernel
    dnums = eqn.params["dimension_numbers"]
    spatial = [rhs.shape[d] for d in dnums.rhs_spec[2:]]
    cin_per_group = rhs.shape[dnums.rhs_spec[1]]
    return 2 * int(np.prod(out.shape)) * int(np.prod(spatial)) * cin_per_group


def _dot_flops(eqn) -> int:
    """2 * |out| * prod(contracted dims of lhs)."""
    out = eqn.outvars[0].aval
    lhs = eqn.invars[0].aval
    (lhs_contract, _), _ = eqn.params["dimension_numbers"]
    k = int(np.prod([lhs.shape[d] for d in lhs_contract]))
    return 2 * int(np.prod(out.shape)) * k


def _count(jaxpr, mult: int = 1) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += mult * _conv_flops(eqn)
        elif name == "dot_general":
            total += mult * _dot_flops(eqn)
        elif name == "scan":
            total += _count(eqn.params["jaxpr"].jaxpr, mult * int(eqn.params["length"]))
        elif name == "while":
            # trip count unknown statically; count one iteration
            total += _count(eqn.params["body_jaxpr"].jaxpr, mult)
        elif name == "cond":
            # max over branches (the executed branch dominates)
            total += max(
                (_count(b.jaxpr, mult) for b in eqn.params["branches"]), default=0
            )
        else:
            for k in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(k)
                if sub is not None:
                    inner = getattr(sub, "jaxpr", sub)
                    total += _count(inner, mult)
    return total


def count_flops(fn, *args, **kwargs) -> int:
    """MXU FLOPs of fn at the given concrete arguments (trace only — no
    compile)."""
    jaxpr = jax.make_jaxpr(fn, static_argnums=())(*args, **kwargs)
    return _count(jaxpr.jaxpr)


# Published dense matmul peaks per chip (FLOP/s).  bf16 is the MFU
# convention peak; f32 given where the hardware has a distinct rate.
_PEAKS = {
    # device_kind substring -> (bf16 peak, note)
    "v5 lite": (197e12, "TPU v5e: 197 TFLOP/s bf16"),
    "v5e": (197e12, "TPU v5e: 197 TFLOP/s bf16"),
    "v5p": (459e12, "TPU v5p: 459 TFLOP/s bf16"),
    "v5": (459e12, "TPU v5p: 459 TFLOP/s bf16"),
    "v4": (275e12, "TPU v4: 275 TFLOP/s bf16"),
    "v6": (918e12, "TPU v6e: 918 TFLOP/s bf16"),
    "v3": (123e12, "TPU v3: 123 TFLOP/s bf16"),
}


def chip_peak_flops(device=None) -> tuple[float, str]:
    """(bf16 dense peak FLOP/s, description) for the attached chip."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    kl = kind.lower()
    for key, (peak, note) in _PEAKS.items():
        if key in kl:
            return peak, note
    return 197e12, f"unknown chip {kind!r}: assuming v5e 197 TFLOP/s bf16"


def mfu(flops: int, seconds: float, device=None) -> float:
    peak, _ = chip_peak_flops(device)
    return flops / (seconds * peak)
