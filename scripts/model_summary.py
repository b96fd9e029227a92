"""Model summary: per-module parameter counts + compiled cost analysis.

Fills the role of the reference's ``test_model_dims.py`` (torchinfo summary
of the model at full input size) with JAX-native reporting: parameter
breakdown from the pytree, FLOPs/bytes from the lowered XLA executable.

Usage:
    python scripts/model_summary.py [--config NAME] [--abstract]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="swin_73var_geo_depth12_chweight_invar")
    parser.add_argument("--yaml_config", default=None)
    parser.add_argument(
        "--abstract", action="store_true",
        help="shape-only init (eval_shape); no memory allocated, no device needed",
    )
    args = parser.parse_args()

    from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
    from swin_v2_weather_tpu.data.preprocess import derived_channel_counts
    from swin_v2_weather_tpu.models.wrappers import get_model

    params = YParams(args.yaml_config or default_config_path(), args.config)
    params["in_channels"] = np.asarray(params["in_channels"])
    params["out_channels"] = np.asarray(params["out_channels"])
    n_in, n_out = derived_channel_counts(params)
    params["n_in_channels"], params["n_out_channels"] = n_in, n_out
    params["img_shape_x"], params["img_shape_y"] = params.img_size

    model = get_model(params)
    x = jnp.zeros((1, n_in, int(params.img_size[0]), int(params.img_size[1])), jnp.float32)

    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, train=False))
    flat = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]

    print(f"config: {args.config}")
    print(f"input:  {tuple(x.shape)} -> output [1, {n_out}, *]")
    print(f"{'module':70s} {'shape':24s} {'params':>12s}")
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape))
        total += n
        print(f"{name:70s} {str(tuple(leaf.shape)):24s} {n:12,d}")
    print(f"{'TOTAL':70s} {'':24s} {total:12,d}")

    if not args.abstract:
        variables = model.init(jax.random.key(0), x, train=False)
        compiled = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
            variables, x
        ).compile()
        ca = compiled.cost_analysis()
        if ca:
            print(f"\ncompiled forward: {ca.get('flops', 0) / 1e12:.2f} TFLOP, "
                  f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
