"""CLI entry point for training (reference ``train.py:395-415``).

Usage:
    python train.py --config=swin_73var_geo_depth12_chweight_invar \
                    [--yaml_config PATH] [--run_num NN] [--sweep_id ID]

The ``--enable_amp`` flag of the reference does not exist here: TPU training
runs bf16 compute with fp32 parameters by default (``compute_dtype`` in the
config), which needs no GradScaler.
"""

import argparse
import logging
import os

from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
from swin_v2_weather_tpu.training.trainer import Trainer
from swin_v2_weather_tpu.utils.logging_utils import config_logger

config_logger()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_num", default="00", type=str)
    parser.add_argument("--yaml_config", default=default_config_path(), type=str)
    parser.add_argument("--config", default="swin_73var_geo_depth12_chweight_invar", type=str)
    parser.add_argument(
        "--sweep_id", default=None, type=str,
        help="run as a sweep-agent trial worker: a local sweep id (created "
        "with --sweep_config) runs the native in-repo agent "
        "(training/sweeps.py); anything else is handed to wandb.agent",
    )
    parser.add_argument(
        "--sweep_config", default=None, type=str,
        help="path to a wandb-schema sweep YAML: registers a NATIVE local "
        "sweep under <exp_dir>/sweeps/ and runs the agent immediately "
        "(no wandb/network needed)",
    )
    parser.add_argument(
        "--sweep_trials", default=None, type=int,
        help="max trials for this agent (required for random sweeps)",
    )
    parser.add_argument(
        "--enable_amp", action="store_true",
        help="reference-CLI compat (reference train.py:400): mixed precision "
        "on TPU means bf16 compute, which is already the default — this flag "
        "forces it if a config overrode compute_dtype",
    )
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override a config value (yaml-parsed; repeatable), e.g. "
        "--set batch_size=8 --set attn_impl=pallas_qkv",
    )
    args = parser.parse_args()

    params = YParams(os.path.abspath(args.yaml_config), args.config, print_params=False)
    for item in args.set:
        key, _, value = item.partition("=")
        if not _:
            raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
        import yaml as _yaml

        params[key] = _yaml.safe_load(value)
    if args.enable_amp:
        params["compute_dtype"] = "bfloat16"
    sweep_id = args.sweep_id
    if args.sweep_config:
        # register a native local sweep and run its agent right away
        from swin_v2_weather_tpu.training import sweeps

        sweep_id = sweeps.sweep(args.sweep_config, root=params["exp_dir"])
        logging.info("registered native sweep %s", sweep_id)

    trainer = Trainer(params, args.config, run_num=args.run_num, sweep_id=sweep_id)

    if sweep_id and trainer.is_chief:
        # HPO sweep: the agent mutates params before each trial (reference
        # train.py:407-408). Non-chief processes call build_and_launch
        # directly and receive the mutated params inside Trainer.build via
        # parallel.mesh.broadcast_config (the reference's
        # broadcast_object_list, train.py:130-139).
        from swin_v2_weather_tpu.training import sweeps

        if sweeps.is_local_sweep(sweep_id, params["exp_dir"]):
            records = sweeps.agent(
                sweep_id,
                function=trainer.build_and_launch,
                count=args.sweep_trials,
                root=params["exp_dir"],
            )
            goal = "minimize"
            best = sweeps.best_trial(records, goal)
            if best is not None:
                logging.info(
                    "sweep %s best trial: %s %s=%s params=%s",
                    sweep_id, best["trial"], best["metric"], best["best"],
                    best["params"],
                )
        else:
            try:
                import wandb
            except ImportError as e:
                raise SystemExit(
                    f"--sweep_id {sweep_id!r} is not a local sweep and wandb "
                    "is not installed; create one with --sweep_config"
                ) from e
            wandb.agent(
                sweep_id,
                function=trainer.build_and_launch,
                count=1,
                entity=params.get("entity"),
                project=params.get("project"),
            )
    else:
        trainer.build_and_launch()
    logging.info("DONE")


if __name__ == "__main__":
    main()
