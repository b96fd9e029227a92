"""Full-resolution golden parity: the flagship pipeline vs the torch reference.

Round-1 parity tests pinned the architecture at toy size; this module runs
the *flagship* shape (720x1440, 77->73 channels, embed 768, depth 12,
heads 8, window 9x18 — ``/root/reference/config/swin.yaml:163-173``) through
the three code paths the paper's numbers flow through:

  1. forward output of the transplanted model
     (reference ``networks/swinv2_global.py:657-803``),
  2. the flagship loss value ('weighted absolute temp-std squared geometric
     l2', reference ``utils/losses.py:31-150``),
  3. one scored rollout step through ``inference/scoring.score_rollout``
     vs the reference metric formulas (``utils/weighted_acc_rmse.py:59-104``).

Everything runs in fp32 on CPU. Marked ``slow`` — several full-res forwards
on one core take minutes; run with ``-m slow`` or by node id.
"""

import datetime
import os
import sys
import types

import numpy as np
import pytest

from tests.test_reference_parity import (
    REFERENCE,
    _install_timm_shim,
    torch_to_flax,
)

torch = pytest.importorskip("torch")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "networks")),
        reason="reference tree not mounted",
    ),
]

# flagship swin_73var_geo_depth12_chweight_invar geometry
# (/root/reference/config/swin.yaml:2-57,163-173 + train.py:88-98)
H, W = 720, 1440
N_DATA = 73  # ERA5 channels
N_STATIC = 3  # one-hot landmask (2) + orography (1)
IN_CHANS = N_DATA + 1 + N_STATIC  # + zenith = 77
FLAGSHIP = dict(
    img_size=(H, W), patch_size=4, in_chans=IN_CHANS, out_chans=N_DATA,
    embed_dim=768, depth=12, num_heads=8, window_ratio=80,
    full_pos_embed=True, rel_pos=False, residual=True, mlp_ratio=4.0,
)


@pytest.fixture(scope="module")
def reference_module():
    _install_timm_shim()
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        mod = importlib.import_module("networks.swinv2_global")
    finally:
        sys.path.remove(REFERENCE)
    return mod


@pytest.fixture(scope="module")
def transplanted(reference_module):
    """(torch_model, flax_model, flax_params) at flagship size."""
    import jax
    import jax.numpy as jnp

    from swin_v2_weather_tpu.models.swin import SwinTransformerV2

    c = FLAGSHIP
    ref = reference_module.SwinTransformerV2Cr(
        img_size=c["img_size"], patch_size=c["patch_size"],
        depths=(c["depth"],), num_heads=(c["num_heads"],),
        in_chans=c["in_chans"], out_chans=c["out_chans"],
        embed_dim=c["embed_dim"], img_window_ratio=c["window_ratio"],
        drop_path_rate=0.0, full_pos_embed=c["full_pos_embed"],
        rel_pos=c["rel_pos"], mlp_ratio=c["mlp_ratio"],
        checkpoint_stages=False, residual=c["residual"],
    ).eval()
    # norm scales are zero-init (blocks start as identities); randomize them
    # so parity actually exercises the attention/mlp branches
    g = torch.Generator().manual_seed(1234)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "norm" in name or "logit_scale" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.3)

    ours = SwinTransformerV2(
        img_size=c["img_size"], patch_size=c["patch_size"],
        in_chans=c["in_chans"], out_chans=c["out_chans"],
        embed_dim=c["embed_dim"], depth=c["depth"],
        num_heads=c["num_heads"], img_window_ratio=c["window_ratio"],
        full_pos_embed=c["full_pos_embed"], rel_pos=c["rel_pos"],
        residual=c["residual"], dtype=jnp.float32, scan_blocks=False,
        attn_impl="xla",
    )
    x0 = jnp.zeros((1, c["in_chans"], H, W), jnp.float32)
    template = jax.eval_shape(lambda: ours.init(jax.random.key(0), x0))
    mapped = torch_to_flax(ref, template["params"], rel_pos=c["rel_pos"], cfg=c)
    shapes_t = jax.tree_util.tree_map(lambda a: tuple(a.shape), template["params"])
    shapes_m = jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), mapped)
    assert shapes_t == shapes_m, "flagship param tree mismatch"
    return ref, ours, mapped


@pytest.fixture(scope="module")
def sample_batch():
    rng = np.random.default_rng(99)
    inp = rng.standard_normal((1, IN_CHANS, H, W)).astype(np.float32)
    tar = rng.standard_normal((1, N_DATA, H, W)).astype(np.float32)
    return inp, tar


@pytest.fixture(scope="module")
def forward_pair(transplanted, sample_batch):
    """(y_torch, y_ours) on the same flagship input — shared by the tests."""
    import jax.numpy as jnp

    ref, ours, mapped = transplanted
    inp, _ = sample_batch
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(inp)).numpy()
    y_ours = np.asarray(ours.apply({"params": mapped}, jnp.asarray(inp)))
    return y_ref, y_ours


class TestFlagshipGoldenParity:
    def test_forward_matches_torch_at_full_resolution(self, forward_pair):
        from tests.conftest import parity_record

        y_ref, y_ours = forward_pair
        assert y_ours.shape == y_ref.shape == (1, N_DATA, H, W)
        scale = float(np.abs(y_ref).max())
        parity_record(
            "flagship_fullres_forward",
            {
                "max_abs_diff": float(np.abs(y_ours - y_ref).max()),
                "output_scale": scale,
                "tolerance": 2e-3 * scale,
            },
        )
        np.testing.assert_allclose(y_ours, y_ref, atol=2e-3 * scale, rtol=2e-3)

    def test_flagship_loss_value_matches_torch(self, forward_pair, sample_batch, tmp_path):
        """Same (gen, tar, inp) through both LossHandlers, flagship spec."""
        import importlib

        import jax.numpy as jnp

        from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
        from swin_v2_weather_tpu.ops.losses import LossHandler

        # the reference LossHandler imports torch_harmonics at module load
        # for the (unused here) H1/SHT path; satisfy it with our own
        # quadrature twins + a stub SHT class
        if "torch_harmonics" not in sys.modules:
            from swin_v2_weather_tpu.ops import quadrature as quad

            th = types.ModuleType("torch_harmonics")

            class _NoSHT:
                def __init__(self, *a, **k):
                    raise NotImplementedError("SHT not needed for l2 loss")

            th.RealSHT = _NoSHT
            thq = types.ModuleType("torch_harmonics.quadrature")
            thq.clenshaw_curtiss_weights = quad.clenshaw_curtiss_weights
            thq.legendre_gauss_weights = quad.legendre_gauss_weights
            th.quadrature = thq
            sys.modules["torch_harmonics"] = th
            sys.modules["torch_harmonics.quadrature"] = thq

        sys.path.insert(0, REFERENCE)
        try:
            ref_losses = importlib.import_module("utils.losses")
        finally:
            sys.path.remove(REFERENCE)

        rng = np.random.default_rng(7)
        global_stds = (0.5 + rng.random((1, N_DATA, 1, 1))).astype(np.float32)
        time_diff_stds = (0.1 + rng.random((1, N_DATA, 1, 1))).astype(np.float32)
        gstds_path = tmp_path / "global_stds.npy"
        tdiff_path = tmp_path / "time_diff_stds.npy"
        np.save(gstds_path, global_stds)
        np.save(tdiff_path, time_diff_stds)

        params = YParams(default_config_path(), "swin_73var_geo_depth12_chweight_invar")
        params["n_out_channels"] = N_DATA
        params["img_shape_x"], params["img_shape_y"] = H, W
        params["global_stds_path"] = str(gstds_path)
        params["time_diff_stds_path"] = str(tdiff_path)
        params["in_channels"] = list(range(N_DATA))
        params["out_channels"] = list(range(N_DATA))

        ref_params = types.SimpleNamespace(
            n_future=0, img_shape_x=H, img_shape_y=W, loss=params.loss,
            channel_weights="auto", channel_names=list(params.channel_names),
            n_out_channels=N_DATA, global_stds_path=str(gstds_path),
            time_diff_stds_path=str(tdiff_path),
            out_channels=np.arange(N_DATA), dt=int(params.dt),
            model_grid_type=str(params.model_grid_type),
        )
        ref_handler = ref_losses.LossHandler(ref_params).train()

        inp, tar = sample_batch
        y_ref, y_ours = forward_pair
        with torch.no_grad():
            loss_ref = float(
                ref_handler(
                    torch.from_numpy(y_ref), torch.from_numpy(tar),
                    torch.from_numpy(inp),
                )
            )
        ours_handler = LossHandler(params)
        loss_ours = float(
            ours_handler(jnp.asarray(y_ours), jnp.asarray(tar), jnp.asarray(inp))
        )
        # the two loss pipelines see near-identical (not bitwise-equal)
        # predictions, so match to the forward tolerance
        from tests.conftest import parity_record

        parity_record(
            "flagship_fullres_loss",
            {
                "loss_ours": loss_ours,
                "loss_torch": loss_ref,
                "rel_diff": abs(loss_ours - loss_ref) / loss_ref,
                "tolerance_rel": 5e-3,
            },
        )
        assert loss_ref > 0
        assert abs(loss_ours - loss_ref) / loss_ref < 5e-3, (loss_ours, loss_ref)

    def test_2step_finetune_trajectory_at_full_resolution(
        self, reference_module, tmp_path
    ):
        """Three 2-step-fine-tune optimizer steps at FULL 720x1440 resolution
        vs the torch reference (VERDICT r3 next #4b): MultiStepWrapper
        rollout (reference ``networks/helpers.py:18-41``), flagship loss
        spec with its 1/(n_future+1) multistep weighting
        (``utils/losses.py:127-132``), Adam lr 1e-4
        (``config/swin.yaml:199-215``). Per-step losses and a parameter
        spot-check must track torch in fp32.

        Both frameworks run with activation checkpointing (bit-identical
        math, recomputed) — without it the two resident full-res 2-step
        autograd graphs peak past this dev box's 125 GB and the kernel
        OOM-kills the test (observed r5: 130 GB RSS)."""
        self._run_2step_trajectory(
            reference_module, tmp_path, FLAGSHIP,
            record_name="flagship_fullres_2step_finetune_trajectory",
        )

    def test_2step_finetune_trajectory_at_half_geometry(
        self, reference_module, tmp_path
    ):
        """The same 2-step trajectory at HALF geometry (360x720,
        window_ratio 40): identical architecture, head count, and — key —
        the identical 9x18 window with its lat-only mask and cyclic roll
        (the grid is 90x180 = 10x10 windows instead of 20x20). Runs in
        ~1/4 the time/memory of the full-res variant; exists so the
        trajectory proxy lands inside dev-box budgets that the full-res
        variant exceeds."""
        half = dict(FLAGSHIP, img_size=(360, 720), window_ratio=40)
        self._run_2step_trajectory(
            reference_module, tmp_path, half,
            record_name="flagship_halfgeom_2step_finetune_trajectory",
        )

    def _run_2step_trajectory(self, reference_module, tmp_path, c, record_name):
        import importlib

        import jax
        import jax.numpy as jnp
        import optax

        from tests.test_reference_parity import _install_torch_harmonics_shim
        from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
        from swin_v2_weather_tpu.models.swin import SwinTransformerV2
        from swin_v2_weather_tpu.models.wrappers import MultiStepWrapper
        from swin_v2_weather_tpu.ops.losses import LossHandler

        _install_torch_harmonics_shim()
        sys.path.insert(0, REFERENCE)
        try:
            helpers = importlib.import_module("networks.helpers")
            ref_losses = importlib.import_module("utils.losses")
        finally:
            sys.path.remove(REFERENCE)

        n_future, n_steps, lr = 1, 3, 1e-4
        h, w = c["img_size"]

        ref_core = reference_module.SwinTransformerV2Cr(
            img_size=c["img_size"], patch_size=c["patch_size"],
            depths=(c["depth"],), num_heads=(c["num_heads"],),
            in_chans=c["in_chans"], out_chans=c["out_chans"],
            embed_dim=c["embed_dim"], img_window_ratio=c["window_ratio"],
            drop_path_rate=0.0, full_pos_embed=True, rel_pos=False,
            mlp_ratio=c["mlp_ratio"], checkpoint_stages=True, residual=True,
        ).eval()
        g = torch.Generator().manual_seed(77)
        with torch.no_grad():
            for name, p in ref_core.named_parameters():
                if "norm" in name or "logit_scale" in name:
                    p.copy_(torch.randn(p.shape, generator=g) * 0.3)
        fake_params = types.SimpleNamespace(
            n_future=n_future, add_orography=1, add_landmask=1
        )
        ref_wrap = helpers.MultiStepWrapper(fake_params, lambda p: ref_core).eval()

        ours_core = SwinTransformerV2(
            img_size=c["img_size"], patch_size=c["patch_size"],
            in_chans=c["in_chans"], out_chans=c["out_chans"],
            embed_dim=c["embed_dim"], depth=c["depth"],
            num_heads=c["num_heads"], img_window_ratio=c["window_ratio"],
            full_pos_embed=True, rel_pos=False, residual=True,
            dtype=jnp.float32, scan_blocks=False, attn_impl="xla",
            checkpoint_stages=True,
        )
        ours_wrap = MultiStepWrapper(
            model=ours_core, n_future=n_future, n_invar=N_STATIC
        )

        # flagship loss, both handlers, n_future=1 training weighting
        rng = np.random.default_rng(5)
        global_stds = (0.5 + rng.random((1, N_DATA, 1, 1))).astype(np.float32)
        time_diff_stds = (0.1 + rng.random((1, N_DATA, 1, 1))).astype(np.float32)
        np.save(tmp_path / "global_stds.npy", global_stds)
        np.save(tmp_path / "time_diff_stds.npy", time_diff_stds)
        params_y = YParams(
            default_config_path(), "swin_73var_geo_depth12_chweight_invar_2step"
        )
        params_y["n_out_channels"] = N_DATA
        params_y["img_shape_x"], params_y["img_shape_y"] = h, w
        params_y["global_stds_path"] = str(tmp_path / "global_stds.npy")
        params_y["time_diff_stds_path"] = str(tmp_path / "time_diff_stds.npy")
        params_y["in_channels"] = list(range(N_DATA))
        params_y["out_channels"] = list(range(N_DATA))
        assert int(params_y.n_future) == n_future  # the reference 2-step config
        ours_loss = LossHandler(params_y)
        ref_loss = ref_losses.LossHandler(
            types.SimpleNamespace(
                n_future=n_future, img_shape_x=h, img_shape_y=w,
                loss=params_y.loss, channel_weights="auto",
                channel_names=list(params_y.channel_names),
                n_out_channels=N_DATA,
                global_stds_path=str(tmp_path / "global_stds.npy"),
                time_diff_stds_path=str(tmp_path / "time_diff_stds.npy"),
                out_channels=np.arange(N_DATA), dt=int(params_y.dt),
                model_grid_type=str(params_y.model_grid_type),
            )
        ).train()

        batches = [
            (
                rng.standard_normal((1, IN_CHANS, h, w)).astype(np.float32),
                rng.standard_normal((1, n_future + 1, h, w)).astype(np.float32),
                rng.standard_normal(
                    (1, (n_future + 1) * N_DATA, h, w)
                ).astype(np.float32),
            )
            for _ in range(n_steps)
        ]

        x0 = jnp.zeros((1, c["in_chans"], h, w), jnp.float32)
        template = jax.eval_shape(lambda: ours_core.init(jax.random.key(0), x0))
        params = {"model": torch_to_flax(ref_core, template["params"], cfg=c)}

        opt_t = torch.optim.Adam(ref_core.parameters(), lr=lr, betas=(0.9, 0.95))
        losses_t = []
        for x, coszen, tar in batches:
            opt_t.zero_grad()
            out = ref_wrap(torch.from_numpy(x), torch.from_numpy(coszen))
            loss = ref_loss(out, torch.from_numpy(tar), torch.from_numpy(x))
            loss.backward()
            opt_t.step()
            losses_t.append(float(loss))

        tx = optax.adam(lr, b1=0.9, b2=0.95)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, opt_state, x, coszen, tar):
            def loss_fn(pp):
                out = ours_wrap.apply({"params": pp}, x, coszen=coszen)
                return ours_loss(out, tar, x)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        losses_j = []
        for x, coszen, tar in batches:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(coszen),
                jnp.asarray(tar),
            )
            losses_j.append(float(loss))

        from tests.conftest import parity_record

        parity_record(
            record_name,
            {
                "losses_ours": losses_j,
                "losses_torch": losses_t,
                "max_rel_diff": float(
                    np.max(
                        np.abs(np.asarray(losses_j) - np.asarray(losses_t))
                        / np.abs(losses_t)
                    )
                ),
                "tolerance_rel": 2e-3,
            },
        )
        np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=1e-7)
        # spot-check a trained parameter tensor after the 3 steps
        final_ref = torch_to_flax(ref_core, template["params"], cfg=c)
        np.testing.assert_allclose(
            np.asarray(params["model"]["head"]["kernel"]),
            np.asarray(final_ref["head"]["kernel"]),
            atol=5e-4,
        )

    def test_scored_rollout_step_matches_reference_metrics(
        self, transplanted, tmp_path
    ):
        """One autoregressive step through RolloutEngine + score_rollout;
        RMSE/ACC cross-checked against the reference formulas
        (utils/weighted_acc_rmse.py:59-104) and the prediction itself
        cross-checked against the torch model stepping the same state."""
        import importlib

        from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
        from swin_v2_weather_tpu.data.conditioning import static_features
        from swin_v2_weather_tpu.inference.rollout import RolloutEngine
        from swin_v2_weather_tpu.inference.scoring import score_rollout

        sys.path.insert(0, REFERENCE)
        try:
            ref_metrics = importlib.import_module("utils.weighted_acc_rmse")
        finally:
            sys.path.remove(REFERENCE)

        ref, ours, mapped = transplanted
        rng = np.random.default_rng(17)

        # static conditioning from .npy files so both sides read identical
        # fields (synthetic-but-deterministic landmask + orography)
        lsm = (rng.random((H, W)) > 0.6).astype(np.float32)
        oro = rng.random((H, W)).astype(np.float32)
        lsm_path, oro_path = tmp_path / "lsm.npy", tmp_path / "oro.npy"
        np.save(lsm_path, lsm)
        np.save(oro_path, oro)

        params = YParams(default_config_path(), "swin_73var_geo_depth12_chweight_invar")
        params["in_channels"] = list(range(N_DATA))
        params["out_channels"] = list(range(N_DATA))
        params["img_shape_x"], params["img_shape_y"] = H, W
        params["landmask_path"] = str(lsm_path)
        params["orography_path"] = str(oro_path)

        engine = RolloutEngine(params, ours, {"params": mapped})

        state0 = rng.standard_normal((1, N_DATA, H, W)).astype(np.float32)
        target = rng.standard_normal((1, N_DATA, H, W)).astype(np.float32)
        means = rng.standard_normal(N_DATA).astype(np.float32)
        stds = (0.5 + rng.random(N_DATA)).astype(np.float32)
        clim = rng.standard_normal((N_DATA, H, W)).astype(np.float32)
        start = datetime.datetime(2018, 1, 1, 0, tzinfo=datetime.timezone.utc)

        scores = score_rollout(
            engine, state0, [target], start, means, stds, climatology=clim,
        )
        assert scores["rmse"].shape == (1, N_DATA)
        assert scores["acc"].shape == (1, N_DATA)
        assert scores["lead_hours"][0] == 6

        # torch reference steps the same state with the same zenith + statics
        zen = engine.zenith_at(start)  # [1, 1, H, W]
        static = static_features(params)[None]  # [1, 3, H, W]
        torch_inp = torch.from_numpy(
            np.concatenate([state0, zen, static], axis=1)
        )
        with torch.no_grad():
            pred_ref = ref(torch_inp)

        # prediction parity at full res
        pred_ours = np.asarray(next(engine.steps(state0, start, 1)))
        scale = float(pred_ref.abs().max())
        np.testing.assert_allclose(
            pred_ours, pred_ref.numpy(), atol=2e-3 * scale, rtol=2e-3
        )

        # metric-formula parity: reference formulas on OUR prediction
        m = means.reshape(1, -1, 1, 1)
        s = stds.reshape(1, -1, 1, 1)
        pred_phys = torch.from_numpy(pred_ours * s + m)
        tar_phys = torch.from_numpy(target * s + m)
        with torch.no_grad():
            rmse_ref = ref_metrics.weighted_rmse_torch(pred_phys, tar_phys).numpy()
            acc_ref = ref_metrics.weighted_acc_torch(
                pred_phys - torch.from_numpy(clim[None]),
                tar_phys - torch.from_numpy(clim[None]),
            ).numpy()
        from tests.conftest import parity_record

        parity_record(
            "flagship_fullres_scored_rollout",
            {
                "pred_max_abs_diff": float(
                    np.abs(pred_ours - pred_ref.numpy()).max()
                ),
                "pred_scale": scale,
                "rmse_max_rel_diff": float(
                    np.max(np.abs(scores["rmse"][0] - rmse_ref) / np.abs(rmse_ref))
                ),
                "acc_max_abs_diff": float(np.max(np.abs(scores["acc"][0] - acc_ref))),
                "tolerance_rel": 2e-4,
            },
        )
        np.testing.assert_allclose(scores["rmse"][0], rmse_ref, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(scores["acc"][0], acc_ref, rtol=2e-4, atol=1e-5)
