"""Training runtime: experiment setup, epoch loop, validation, checkpoints.

Behavioral equivalent of the reference ``train.py`` ``Trainer``
(``train.py:48-393``), re-architected for the TPU execution model:

  * no process-group bootstrap — a single host process drives every local
    chip through one jitted step over the mesh; multi-host pods add
    ``jax.distributed.initialize`` (parallel/mesh.py) but the trainer code
    is identical;
  * the hot loop is: pull an already-device-sharded batch from the prefetch
    queue → call the compiled step → append the (still-on-device) loss to a
    list. No blocking collective, no per-step ``item()`` host sync
    (reference ``train.py:292-294``); losses are fetched once per epoch;
  * validation accumulates loss + per-channel latitude-weighted RMSE inside
    the compiled eval step (reference ``train.py:305-371``), denormalized
    once per epoch on the host;
  * checkpoint-per-epoch + best-checkpoint on validation improvement, with
    the reference's finetune/resume gating (``train.py:195-206, 250-257``);
  * experiment-dir layout, ``hyperparams.yaml`` dump and log files mirror
    the reference so downstream registry tooling keeps working
    (``train.py:100-116, 156-163``).
"""

from __future__ import annotations

import logging
import os
import time
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from swin_v2_weather_tpu.data.pipeline import device_prefetch, get_data_loader
from swin_v2_weather_tpu.data.preprocess import Preprocessor, derived_channel_counts
from swin_v2_weather_tpu.models.wrappers import get_model
from swin_v2_weather_tpu.ops.losses import LossHandler
from swin_v2_weather_tpu.parallel.mesh import init_distributed, make_mesh, replicated_sharding
from swin_v2_weather_tpu.training import checkpoint as ckpt
from swin_v2_weather_tpu.training.optim import (
    build_optimizer,
    build_scheduler,
    set_learning_rate,
)
from swin_v2_weather_tpu.training.step import (
    TrainState,
    build_eval_step,
    build_train_step,
    state_shardings,
)
from swin_v2_weather_tpu.utils.logging_utils import log_to_file, log_versions
from swin_v2_weather_tpu.utils.metrics_sink import MetricsSink
from swin_v2_weather_tpu.utils.profiling import StepProfiler, StepTimer

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, params, config_name: str, run_num: str = "00", sweep_id=None):
        self.params = params
        self.config = config_name
        self.run_num = run_num
        self._base_run_num = run_num  # sweep trials derive per-trial run ids
        self.sweep_id = sweep_id
        self.root_dir = params["exp_dir"]

        self.process_index, self.process_count = init_distributed(params)
        self.is_chief = self.process_index == 0
        self.log_to_screen = bool(params.log_to_screen) and self.is_chief

        params["name"] = f"{config_name}_{run_num}"
        params["group"] = config_name
        # host-side data sharding: one shard per process (each process feeds
        # its local chips; the mesh shards the global batch across them)
        params["data_num_shards"] = self.process_count
        params["data_shard_id"] = self.process_index

        # graceful-preemption hook (training/preempt.py); train() installs a
        # signal-backed handler unless one was injected beforehand (tests,
        # custom schedulers)
        self.preempt = None
        self._preempted_at = None

    def count_parameters(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.state.params))

    # ------------------------------------------------------------------
    def build(self):
        params = self.params
        if self.sweep_id is not None and self.is_chief:
            # running inside a sweep-agent trial: the agent's mutated params
            # must merge before anything derived is computed (reference
            # train.py:118-123). Two agents can drive this: the native
            # in-repo one (training/sweeps.py — air-gapped pods) or wandb's.
            from swin_v2_weather_tpu.training import sweeps as _sweeps

            trial_cfg = _sweeps.active_config()
            if trial_cfg is not None:
                # per-trial experiment dir: runs/sweeps/<id>/<cfg>/<run-trialNNN>
                self.run_num = f"{self._base_run_num}-{_sweeps.active_trial_name()}"
                params.update_params(trial_cfg)
            else:
                import wandb

                if getattr(wandb, "run", None) is None:
                    wandb.init()
                params.update_params(dict(wandb.config))
        if self.sweep_id is not None and self.process_count > 1:
            # the wandb agent mutated the chief's params only — every process
            # must see the same trial config (reference train.py:130-139)
            from swin_v2_weather_tpu.parallel.mesh import broadcast_config

            mutated = broadcast_config(_plain_dict(params) if self.is_chief else None)
            if not self.is_chief:
                self.params.update_params(mutated)
        params["in_channels"] = np.asarray(params["in_channels"])
        params["out_channels"] = np.asarray(params["out_channels"])
        n_in, n_out = derived_channel_counts(params)
        params["n_in_channels"] = n_in
        params["n_out_channels"] = n_out

        # experiment dirs (reference train.py:100-116); sweep trials get a
        # sweep-scoped dir so different sweeps don't resume each other
        # (reference train.py:101-103)
        if self.sweep_id is not None:
            exp_dir = os.path.join(
                self.root_dir, "sweeps", str(self.sweep_id), self.config, str(self.run_num)
            )
        else:
            exp_dir = os.path.join(self.root_dir, self.config, str(self.run_num))
        if self.is_chief:
            os.makedirs(os.path.join(exp_dir, "training_checkpoints"), exist_ok=True)
        exp_dir = os.path.abspath(exp_dir)
        params["experiment_dir"] = exp_dir
        params["checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "ckpt")
        params["best_checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "best_ckpt")
        params["resuming"] = ckpt.latest_checkpoint_exists(params["checkpoint_path"])

        if self.is_chief and params.log_to_screen:
            log_to_file(logger_name=None, log_filename=os.path.join(exp_dir, "out.log"))
            log_versions()

        self.mesh = make_mesh(params)
        n_data_shards = int(self.mesh.shape["data"])
        params["global_batch_size"] = int(params.batch_size)
        # per-process host batch (the loader's unit); the mesh splits it
        # further across local devices
        params["local_batch_size"] = int(params.batch_size) // self.process_count
        if params["global_batch_size"] % n_data_shards:
            raise ValueError(
                f"global batch {params.batch_size} not divisible by data shards {n_data_shards}"
            )

        # data
        self.train_loader, self.train_dataset = get_data_loader(
            params, params.train_data_path, train=True
        )
        self.valid_loader, self.valid_dataset = get_data_loader(
            params, params.valid_data_path, train=False
        )
        params["img_shape_x"] = self.train_dataset.img_shape_x
        params["img_shape_y"] = self.train_dataset.img_shape_y

        if self.is_chief:
            with open(os.path.join(exp_dir, "hyperparams.yaml"), "w") as f:
                yaml.safe_dump(_plain_dict(params), f)

        # loss, model, preprocessing
        self.loss_obj = LossHandler(params)
        self.preprocessor = Preprocessor(params)
        self.model = get_model(params)
        # spatial sharding: init with an unsharded clone (identical param
        # tree — pos_embed et al keep global shapes; lax.axis_index needs
        # the shard_map the train/eval steps provide)
        self._init_model = self.model
        self._spatial = int(getattr(params, "spatial_shards", 1) or 1) > 1
        if self._spatial:
            sp = params["spatial_shards"]
            params["spatial_shards"] = 1
            self._init_model = get_model(params)
            params["spatial_shards"] = sp

        # init params (deterministic trace: no dropout rngs needed)
        seed = int(getattr(params, "seed", 333) or 333)
        self.rng = jax.random.key(seed)
        init_rng, self.rng = jax.random.split(self.rng)
        dummy_inp = jnp.zeros((1, n_in, params.img_shape_x, params.img_shape_y), jnp.float32)
        dummy_tzen = (
            jnp.zeros((1, int(params.n_future) + 1, params.img_shape_x, params.img_shape_y))
            if params.add_zenith
            else None
        )
        variables = self._init_model.init(init_rng, dummy_inp, coszen=dummy_tzen, train=False)

        self.optimizer = build_optimizer(params)
        abstract = jax.eval_shape(
            lambda p: TrainState.create(p, self.optimizer), variables["params"]
        )
        ssh = state_shardings(
            abstract, self.mesh,
            shard_opt_state=bool(getattr(params, "shard_opt_state", False)),
            shard_params=bool(getattr(params, "shard_params", False)),
        )
        self.state = jax.jit(
            lambda p: TrainState.create(p, self.optimizer), out_shardings=ssh
        )(variables["params"])
        del variables

        self.train_step = build_train_step(
            self.model, self.loss_obj, self.preprocessor, self.optimizer, self.mesh,
            state_shardings=ssh,
        )
        self.eval_step = build_eval_step(
            self.model, self.loss_obj, self.preprocessor, self.mesh, n_out,
            params_sharding=ssh.params,
        )

        # restore (reference train.py:195-206)
        self.start_epoch = 0
        self.resume_step_in_epoch = 0
        if params.finetune and not params["resuming"]:
            assert params.pretrained_checkpoint_path is not None, (
                "error, please specify a valid pretrained checkpoint path"
            )
            if self.log_to_screen:
                logger.info("Loading checkpoint %s", params.pretrained_checkpoint_path)
            restored = ckpt.restore_checkpoint(
                params.pretrained_checkpoint_path, self.state, resuming=False
            )
            self.state = restored["state"]
        if params["resuming"]:
            if self.log_to_screen:
                logger.info("Loading checkpoint %s", params["checkpoint_path"])
            restored = ckpt.restore_checkpoint(
                params["checkpoint_path"], self.state, resuming=True,
                scheduler_template=build_scheduler(params).state_dict(),
            )
            self.state = restored["state"]
            self.start_epoch = restored["epoch"]
            # nonzero after a graceful-preemption save: the first resumed
            # epoch skips the batches that were already applied
            self.resume_step_in_epoch = int(restored.get("step_in_epoch", 0))

        self.epoch = self.start_epoch
        self.scheduler = build_scheduler(params, last_epoch=self.start_epoch - 1)
        if params["resuming"] and "scheduler" in restored:
            # plateau scheduler keeps its reduced LR / best / patience across
            # restarts (the reference keeps LR inside the torch opt state)
            self.scheduler.load_state_dict(restored["scheduler"])
        # host-side mirror of state.step: reading the device scalar every
        # iteration would block on the previous step's output
        self.host_step = int(self.state.step)

        # validation denormalization stds (reference train.py:306-308)
        if os.path.exists(str(params.global_stds_path)):
            self.valid_stds = np.load(params.global_stds_path)[0, params["out_channels"], 0, 0]
        elif str(getattr(params, "data_loader_config", "")) == "synthetic":
            self.valid_stds = np.ones(n_out, dtype=np.float32)  # unit-variance fields
        else:
            raise FileNotFoundError(
                f"global_stds_path {params.global_stds_path!r} missing — "
                "validation RMSE denormalization would be silently wrong"
            )

        self.sink = MetricsSink(
            exp_dir,
            enabled=self.is_chief,
            use_wandb=bool(params.log_to_wandb),
            wandb_kwargs=dict(
                config=_plain_dict(params),
                name=params["name"],
                group=params["group"],
                project=getattr(params, "project", "swin-weather-tpu"),
                entity=getattr(params, "entity", None),
                resume=params["resuming"],
            ),
        )

        self.profiler = StepProfiler(params, exp_dir, enabled=self.is_chief)
        self.step_timer = StepTimer()
        self.ckpt_writer = ckpt.CheckpointWriter() if params.save_checkpoint else None

        if self.log_to_screen:
            logger.info("Number of parameters = %d", self.count_parameters())
            logger.info(
                "Mesh: %s over %d devices (%d processes)",
                dict(self.mesh.shape), self.mesh.size, self.process_count,
            )
        return self

    def build_and_launch(self):
        self.build()
        self.train()

    # ------------------------------------------------------------------
    def train(self):
        params = self.params
        if self.log_to_screen:
            logger.info("Starting Training Loop...")

        from swin_v2_weather_tpu.training.preempt import PreemptionHandler

        if self.preempt is None:
            self.preempt = PreemptionHandler().install()
        best_valid_loss = 1.0e6
        try:
            self._train_loop(params, best_valid_loss)
        finally:
            self.preempt.uninstall()

    def _train_loop(self, params, best_valid_loss):
        for epoch in range(self.start_epoch, int(params.max_epochs)):
            start = time.time()
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, self.scheduler.lr)
            )

            skip = self.resume_step_in_epoch if epoch == self.start_epoch else 0
            tr_time, train_logs = self.train_one_epoch(epoch, skip_steps=skip)

            if self._preempted_at is not None:
                # graceful preemption (training/preempt.py): persist the
                # state AT THE STEP BOUNDARY with the intra-epoch position;
                # the scheduler was not stepped for this incomplete epoch,
                # so resume re-enters it with the same LR and skips the
                # consumed batches of the deterministic epoch order
                if self.ckpt_writer is not None:
                    self.ckpt_writer.save(
                        params["checkpoint_path"], self.state, epoch,
                        self.scheduler.state_dict(),
                        step_in_epoch=self._preempted_at,
                    )
                self.sink.log(
                    {**train_logs, "preempted_at_step": self._preempted_at},
                    step=self.epoch,
                )
                if self.log_to_screen:
                    logger.warning(
                        "preempted at epoch %d step %d: checkpoint saved, "
                        "exiting cleanly", epoch, self._preempted_at,
                    )
                break
            valid_time, valid_logs = self.validate_one_epoch()

            self.scheduler.step(valid_logs["valid_loss"])

            if self.ckpt_writer is not None:
                # async: blocks only for the device->host snapshot; the disk
                # write overlaps the next epoch (single-controller orbax save
                # coordinates all processes, so no is_chief gate)
                sched_state = self.scheduler.state_dict()
                self.ckpt_writer.save(
                    params["checkpoint_path"], self.state, self.epoch, sched_state
                )
                if valid_logs["valid_loss"] <= best_valid_loss:
                    self.ckpt_writer.save(
                        params["best_checkpoint_path"], self.state, self.epoch, sched_state
                    )
                    best_valid_loss = valid_logs["valid_loss"]

            self.sink.log(
                {**train_logs, **valid_logs, "lr": self.scheduler.lr,
                 "epoch_time": time.time() - start, "train_time": tr_time,
                 "valid_time": valid_time},
                step=self.epoch,
            )
            if self.log_to_screen:
                logger.info("Time taken for epoch %d is %.2f sec", epoch + 1, time.time() - start)
                logger.info("Training time = %.2f, Valid time = %.2f", tr_time, valid_time)
                logger.info(
                    "Train loss: %s. Valid loss: %s",
                    train_logs["loss"], valid_logs["valid_loss"],
                )
        if self.ckpt_writer is not None:
            self.ckpt_writer.close()
        self.profiler.close()
        self.sink.close()

    def train_one_epoch(self, epoch: int, skip_steps: int = 0):
        self.epoch += 1
        self.train_loader.set_epoch(epoch)
        tr_start = time.time()
        losses = []
        self._preempted_at = None
        # epoch rng depends only on (seed, epoch) — restart-invariant, so a
        # preemption-resumed epoch draws the same per-step dropout keys (the
        # step rng additionally folds in the restored global step counter)
        step_rng = jax.random.fold_in(self.rng, epoch)
        batches = iter(self.train_loader)
        if skip_steps:
            # graceful-preemption resume: fast-forward the deterministic
            # epoch order past the steps the interrupted run already applied
            import itertools

            batches = itertools.islice(batches, skip_steps, None)
            if self.log_to_screen:
                logger.info("resuming epoch %d at step %d", epoch, skip_steps)
        n_done = skip_steps
        for batch in device_prefetch(
            batches, self.mesh,
            depth=int(getattr(self.params, "prefetch_depth", 2)),
            spatial=self._spatial,
        ):
            self.step_timer.tick()
            self.profiler.step(self.host_step)
            self.state, metrics = self.train_step(self.state, batch, step_rng)
            self.host_step += 1
            n_done += 1
            losses.append(metrics)  # device arrays; fetched lazily below
            if self.preempt is not None and self.preempt.triggered:
                self._preempted_at = n_done
                break
        # one host sync per epoch (device_get batches the transfers)
        fetched = jax.device_get(losses)
        loss_arr = np.asarray([m["loss"] for m in fetched], np.float64)
        gnorm_arr = np.asarray([m["grad_norm"] for m in fetched], np.float64)
        logs = {
            "loss": float(np.mean(loss_arr)) if loss_arr.size else 0.0,
            "grad_norm": float(np.mean(gnorm_arr)) if gnorm_arr.size else 0.0,
            "grad_norm_max": float(np.max(gnorm_arr)) if gnorm_arr.size else 0.0,
            **self.step_timer.reset(),
        }
        if fetched:
            # per-module gradient norms (wandb.watch monitoring role)
            for key in fetched[0]:
                if key.startswith("grad_norm/"):
                    logs[key] = float(np.mean([m[key] for m in fetched]))
        return time.time() - tr_start, logs

    def validate_one_epoch(self):
        valid_start = time.time()
        outs = []
        last_batch = None
        for batch in device_prefetch(
            iter(self.valid_loader), self.mesh, spatial=self._spatial
        ):
            # keep results on device; one host sync at the end of the epoch
            outs.append(self.eval_step(self.state.params, batch))
            last_batch = batch
        steps = max(len(outs), 1)
        outs = jax.device_get(outs)  # one batched host sync for the epoch
        loss_sum = sum(float(o["loss"]) for o in outs)
        rmse_sum = np.sum([np.asarray(o["rmse"], np.float64) for o in outs], axis=0)
        valid_rmse = rmse_sum / steps * np.asarray(self.valid_stds, np.float64)
        logs = {"valid_loss": loss_sum / steps}

        acc_mean = np.mean([np.asarray(o["acc"], np.float64) for o in outs], axis=0)

        track = list(getattr(self.params, "track_channels", ["u10m", "v10m"]))
        names = list(self.params.channel_names)
        for var in track:
            if var in names:
                logs[f"valid_rmse_{var}"] = float(valid_rmse[names.index(var)])
                logs[f"valid_acc_{var}"] = float(acc_mean[names.index(var)])

        # pred-vs-target panel (reference train.py:331-332, 365-369)
        if self.is_chief and bool(getattr(self.params, "save_vis", False)) and last_batch:
            self._save_vis(last_batch)
        return time.time() - valid_start, logs

    def _save_vis(self, batch) -> None:
        from swin_v2_weather_tpu.training.step import _apply_model
        from swin_v2_weather_tpu.utils.img_utils import vis

        inp, tar, tzen = self.preprocessor(batch)
        # _apply_model routes through shard_map when the model is spatially
        # sharded (a bare apply would hit lax.axis_index with no bound axis)
        gen = _apply_model(
            self.model, self.mesh, {"params": self.state.params}, inp, tzen,
            None, train=False,
        )
        fig = vis((np.asarray(gen[0, 0]), np.asarray(tar[0, 0])))
        out = os.path.join(self.params["experiment_dir"], f"vis_epoch{self.epoch}.png")
        fig.savefig(out, dpi=72)
        import matplotlib.pyplot as plt

        plt.close(fig)


def _plain_dict(params) -> dict:
    out = {}
    for key, value in params.params.items():
        if isinstance(value, np.ndarray):
            value = value.tolist()
        out[str(key)] = value
    return out
