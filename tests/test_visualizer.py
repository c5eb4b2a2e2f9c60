"""Visualizer tests: scheduler math, adapter modes, UNet/VAE shapes, a short
training loop that reduces loss, and the render pipeline end-to-end (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.visualizer.adapter import apply_adapter, init_adapter, pad_tokens
from metamorph_tpu.visualizer.scheduler import (DDIMScheduler, DDPMScheduler,
                                                SchedulerConfig)
from metamorph_tpu.visualizer.unet import UNetConfig, init_unet_params, unet_apply
from metamorph_tpu.visualizer.vae import (VAEConfig, init_vae_params, vae_decode,
                                          vae_encode)
from metamorph_tpu.visualizer.train import (VisualizerTrainConfig, lr_schedule,
                                            make_visualizer_train_step)


def test_ddpm_add_noise_math():
    sched = DDPMScheduler()
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.full((2, 4, 4, 4), 2.0)
    t = jnp.asarray([0, 999])
    out = sched.add_noise(x0, noise, t)
    a = np.asarray(sched.alphas_cumprod)
    for b, tt in enumerate([0, 999]):
        expect = np.sqrt(a[tt]) * 1.0 + np.sqrt(1 - a[tt]) * 2.0
        np.testing.assert_allclose(np.asarray(out)[b], expect, rtol=1e-5)


def test_ddpm_step_recovers_x0():
    """With a perfect epsilon prediction, iterating DDIM from x_t returns ~x0."""
    sched = DDIMScheduler()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ddpm = DDPMScheduler()
    t = jnp.asarray([500])
    xt = ddpm.add_noise(x0, noise, t)
    # single DDIM jump t=500 -> -1 with true eps returns exactly x0
    out = sched.step(noise, 500, -1, xt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("mode", ["mlp", "xattn", "xattnffn", "transformer"])
def test_adapter_modes(mode):
    p = init_adapter(jax.random.PRNGKey(0), mode=mode, input_dim=24,
                     hidden_dim=32, output_dim=16, num_tokens=11, num_layers=2,
                     num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24))
    out = apply_adapter(p, x, mode=mode, num_heads=4)
    if mode == "mlp":
        assert out.shape == (2, 5, 16)   # token count unchanged (demo pads)
    else:
        assert out.shape == (2, 11, 16)  # learned queries
    assert np.isfinite(np.asarray(out)).all()
    assert pad_tokens(out, 13).shape == (2, 13, 16)


def test_unet_shapes():
    cfg = UNetConfig.tiny()
    p = init_unet_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.asarray([3, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, cfg.cross_attention_dim))
    out = unet_apply(p, cfg, x, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # conditioning actually reaches the output
    out2 = unet_apply(p, cfg, x, t, ctx * 2.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    p = init_vae_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    lat = vae_encode(p, cfg, img)
    assert lat.shape == (2, 8, 8, 4)  # one downsample level (2 blocks)
    out = vae_decode(p, cfg, lat)
    assert out.shape == img.shape


def test_lr_schedule():
    fn = lr_schedule(1.0, target=1600)
    assert float(fn(0)) == 0.0
    assert abs(float(fn(400)) - 1.0) < 1e-5   # peak at target//4
    assert float(fn(1000)) < 1.0
    assert float(fn(1700)) == 0.0


def test_training_step_reduces_loss():
    tc = VisualizerTrainConfig(adapter_mode="mlp", num_tokens=4, cfg_prob=0.0,
                               learning_rate=1e-3, total_steps=100,
                               batch_size=2, resolution=16)
    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    step, init_state = make_visualizer_train_step(tc, unet_cfg, vae_cfg)
    # adapter input must be 1152-wide by default; use small custom adapter
    from metamorph_tpu.visualizer.adapter import init_adapter as ia

    state = init_state(jax.random.PRNGKey(0))
    state["adapter"] = ia(jax.random.PRNGKey(1), mode="mlp", input_dim=12,
                          hidden_dim=16, output_dim=unet_cfg.cross_attention_dim,
                          num_layers=2)
    # re-init the optimizer for the replaced adapter tree
    import optax

    from metamorph_tpu.visualizer.train import lr_schedule as lrs

    tx = optax.adamw(lrs(tc.learning_rate, tc.total_steps), weight_decay=0.01)
    state["opt_adapter"] = tx.init(state["adapter"])

    sig = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 12))
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 0.5
    losses = []
    for i in range(6):
        state, loss = step(state, sig, imgs, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # noisy objective; no blow-up


def test_render_pipeline():
    from metamorph_tpu.visualizer.pipeline import render

    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    up = init_unet_params(jax.random.PRNGKey(0), unet_cfg)
    vp = init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    ap = init_adapter(jax.random.PRNGKey(2), mode="mlp", input_dim=12,
                      hidden_dim=16, output_dim=unet_cfg.cross_attention_dim,
                      num_layers=2)
    sig = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 12))
    img = render(ap, up, vp, unet_cfg, vae_cfg, sig, jax.random.PRNGKey(4),
                 guidance_scale=7.5, num_inference_steps=3, latent_size=8)
    assert img.shape == (1, 16, 16, 3)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_visualizer_sharded_step_matches_single_device(mesh8):
    """DDP-equivalent mesh step == plain single-device step (params replicated,
    batch sharded over all axes) — reference visualization/train.py:394-395."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    tc = VisualizerTrainConfig(adapter_mode="mlp", num_tokens=4, cfg_prob=0.5,
                               noise_offset=0.05, learning_rate=1e-3,
                               total_steps=100, batch_size=8, resolution=16)
    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    from metamorph_tpu.visualizer.adapter import init_adapter as ia
    import optax
    from metamorph_tpu.visualizer.train import lr_schedule as lrs

    def fresh_state(init_state):
        state = init_state(jax.random.PRNGKey(0))
        state["adapter"] = ia(jax.random.PRNGKey(1), mode="mlp", input_dim=12,
                              hidden_dim=16,
                              output_dim=unet_cfg.cross_attention_dim,
                              num_layers=2)
        tx = optax.adamw(lrs(tc.learning_rate, tc.total_steps), weight_decay=0.01)
        state["opt_adapter"] = tx.init(state["adapter"])
        return state

    sig = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 12))
    imgs = jax.random.normal(jax.random.PRNGKey(3), (8, 16, 16, 3)) * 0.5

    step1, init1 = make_visualizer_train_step(tc, unet_cfg, vae_cfg)
    s1 = fresh_state(init1)
    s1, l1 = step1(s1, sig, imgs, jax.random.PRNGKey(9))

    stepm, initm = make_visualizer_train_step(tc, unet_cfg, vae_cfg, mesh=mesh8)
    sm = fresh_state(initm)
    repl = NamedSharding(mesh8, P())
    bsh = NamedSharding(mesh8, P(mesh8.axis_names))
    sm = jax.device_put(sm, repl)
    sm, lm = stepm(sm, jax.device_put(sig, bsh), jax.device_put(imgs, bsh),
                   jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(l1), float(lm), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1["adapter"]),
                    jax.tree.leaves(jax.device_get(sm["adapter"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_pndm_timesteps_match_diffusers():
    """SD-1.5 PNDM (skip_prk_steps, steps_offset=1): 50 inference steps give
    51 plms timesteps starting [981, 961, 961, 941, ...] and ending at 1."""
    from metamorph_tpu.visualizer.scheduler import PNDMScheduler

    sched = PNDMScheduler()
    ts = sched.set_timesteps(50)
    assert len(ts) == 51
    assert list(ts[:4]) == [981, 961, 961, 941]
    assert ts[-1] == 1


def test_pndm_exact_eps_recovers_x0():
    """With the true constant eps at every call, every multistep combination
    collapses to that eps and the chain walks q(x_t) back to ~x0."""
    from metamorph_tpu.visualizer.scheduler import PNDMScheduler

    sched = PNDMScheduler()
    ddpm = DDPMScheduler()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = sched.set_timesteps(50)
    xt = ddpm.add_noise(x0, noise, jnp.asarray([int(ts[0])]))
    for t in ts:
        xt = sched.step(noise, int(t), xt)
    # final state is q(x_{t=-19}) clamped to final_alpha_cumprod (= a_0)
    a0 = float(np.asarray(ddpm.alphas_cumprod)[0])
    expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=2e-3, atol=2e-3)


def test_render_pipeline_pndm():
    """PNDM render path end-to-end on tiny shapes."""
    from metamorph_tpu.visualizer.pipeline import render

    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    adapter = init_adapter(jax.random.PRNGKey(0), mode="mlp", input_dim=12,
                           hidden_dim=16, output_dim=unet_cfg.cross_attention_dim,
                           num_layers=2)
    unet = init_unet_params(jax.random.PRNGKey(1), unet_cfg)
    vae = init_vae_params(jax.random.PRNGKey(2), vae_cfg)
    sig = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 12))
    out = render(adapter, unet, vae, unet_cfg, vae_cfg, sig,
                 jax.random.PRNGKey(4), num_inference_steps=4, latent_size=8,
                 scheduler="pndm")
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0



def test_from_scratch_unet_lr_schedule():
    """Reference parity: from-scratch UNet uses linear-warmup-then-constant
    (`visualization/train.py:408-411`); finetune keeps log-warmup+decay."""
    import numpy as np

    from metamorph_tpu.visualizer.train import (lr_schedule,
                                                lr_schedule_warmup_constant)

    f = lr_schedule_warmup_constant(1e-4, warmup=10_000)
    np.testing.assert_allclose(float(f(0)), 0.0)
    np.testing.assert_allclose(float(f(5_000)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(f(10_000)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(f(200_000)), 1e-4, rtol=1e-6)  # constant
    g = lr_schedule(1e-4, 16_000)
    assert float(g(15_999)) < float(g(4_000))  # decays after the peak


def test_from_scratch_switches_adapter_schedule_too():
    """The reference swaps BOTH optimizers' schedulers when unet_from_scratch
    (`visualization/train.py:409-418` — the projector scheduler at :416 also
    becomes lr_lambda_warmup_constant). The adapter LR must be constant after
    warmup in from-scratch mode and decaying in finetune mode."""
    from metamorph_tpu.visualizer.train import (VisualizerTrainConfig,
                                                select_lr_schedules)

    scratch = VisualizerTrainConfig(unet_from_scratch=True,
                                    total_steps=16_000, learning_rate=1e-4)
    finetune = VisualizerTrainConfig(unet_from_scratch=False,
                                     total_steps=16_000, learning_rate=1e-4)
    ad_s, un_s = select_lr_schedules(scratch)
    ad_f, un_f = select_lr_schedules(finetune)
    assert float(ad_s(15_000)) == pytest.approx(1e-4)   # constant post-warmup
    assert float(un_s(15_000)) == pytest.approx(scratch.unet_lr)
    assert float(ad_f(15_999)) < 1e-4 * 0.2             # linear decay tail


def test_dpmpp_second_order_interior():
    """DPM-Solver++ (2M) is genuinely second order in the ODE interior: on a
    smooth nonlinear epsilon field, halving the step count must shrink its
    error ~4x while a first-order (DDIM) trajectory shrinks ~2x — the gap
    ratio grows with refinement. (Endpoint-jump error is excluded by
    integrating t=999 -> 99 on custom grids.)"""
    import numpy as np

    from metamorph_tpu.visualizer.scheduler import (
        DDIMScheduler, DPMSolverPlusPlusScheduler, SchedulerConfig)

    cfg = SchedulerConfig()
    ddim = DDIMScheduler(cfg)
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def eps_model(x, t):
        return jnp.tanh(x) * (0.5 + 0.5 * np.cos(t / 200.0))

    def run_dpm(ts):
        s = DPMSolverPlusPlusScheduler(cfg)
        s.set_custom_timesteps(ts)
        x = x_init
        for t in ts[:-1]:        # stop at the last grid point (no endpoint)
            x = s.step(eps_model(x, int(t)), int(t), x)
        return np.asarray(x)

    def run_ddim(ts):
        x = x_init
        for i, t in enumerate(ts[:-1]):
            x = ddim.step(eps_model(x, int(t)), int(t), int(ts[i + 1]), x)
        return np.asarray(x)

    grid = lambda n: np.linspace(999, 99, n).astype(int)
    ref = run_dpm(grid(901))
    ratios = []
    for n in (11, 21, 41):
        e1 = np.abs(run_ddim(grid(n)) - ref).max()
        e2 = np.abs(run_dpm(grid(n)) - ref).max()
        ratios.append(e1 / max(e2, 1e-12))
    # first-vs-second-order gap grows under refinement
    assert ratios[0] > 1.5 and ratios[1] > 1.5 * ratios[0] \
        and ratios[2] > 1.5 * ratios[1], ratios


def test_dpmpp_render_pipeline():
    """DPM++ render path end-to-end on tiny shapes (scheduler='dpmpp')."""
    from metamorph_tpu.visualizer.pipeline import render

    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    adapter = init_adapter(jax.random.PRNGKey(0), mode="mlp", input_dim=12,
                           hidden_dim=16,
                           output_dim=unet_cfg.cross_attention_dim,
                           num_layers=2)
    unet = init_unet_params(jax.random.PRNGKey(1), unet_cfg)
    vae = init_vae_params(jax.random.PRNGKey(2), vae_cfg)
    sig = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 12))
    out = render(adapter, unet, vae, unet_cfg, vae_cfg, sig,
                 jax.random.PRNGKey(4), num_inference_steps=6, latent_size=8,
                 scheduler="dpmpp")
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
