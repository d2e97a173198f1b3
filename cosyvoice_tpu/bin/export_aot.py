"""Ahead-of-time export of the inference programs.

The TPU-native equivalent of the reference's export tools
(`cosyvoice/bin/export_jit.py` TorchScript freeze, `export_onnx.py` ONNX +
TensorRT): serialize the jitted stage programs with `jax.export` so serving
hosts load precompiled StableHLO instead of tracing Python, and run the same
parity check the reference does for ONNX (export_onnx.py:95-101: outputs
allclose rtol 1e-2 / atol 1e-5 over random shapes).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_flow_estimator(flow_model, flow_params, out_dir: str,
                          lengths=(100, 200, 500)) -> None:
    """Export the CFM estimator at several bucket lengths + parity-check."""
    from cosyvoice_tpu.models.flow import ConditionalDecoder

    est = ConditionalDecoder(flow_model.cfg.estimator)
    est_params = {"params": flow_params["params"]["decoder"]["estimator"]}
    os.makedirs(out_dir, exist_ok=True)
    C = flow_model.cfg.output_size
    for T in lengths:
        def fn(x, mask, mu, t, spks, cond):
            return est.apply(est_params, x, mask, mu, t, spks, cond)

        args = (jnp.zeros((2, T, C)), jnp.ones((2, T)), jnp.zeros((2, T, C)),
                jnp.zeros((2,)), jnp.zeros((2, C)), jnp.zeros((2, T, C)))
        exp = jexport.export(jax.jit(fn))(*args)
        path = os.path.join(out_dir, f"estimator_T{T}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        # parity: exported vs eager over random inputs (export_onnx.py:95-101)
        rng = np.random.default_rng(0)
        rand = tuple(jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
                     for a in args)
        got = jexport.deserialize(exp.serialize()).call(*rand)
        want = fn(*rand)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-2, atol=1e-5)
        print(f"exported + verified {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True,
                   help="reference checkpoint dir (llm.pt/flow.pt/hift.pt)")
    p.add_argument("--out_dir", required=True)
    args = p.parse_args()
    from cosyvoice_tpu.runtime.api import from_pretrained

    cv = from_pretrained(args.model_dir)
    export_flow_estimator(cv.model.flow, cv.model.flow_params, args.out_dir)


if __name__ == "__main__":
    main()
