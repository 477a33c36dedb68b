"""WGAN-regularised 3D training.

Re-design of reference lib/core/function3D_GAN.py:18-624 + tools/
train3D_GAN.py:96-440: the generator is a triangulation net, the critic is
the MLP Discriminator over [pose3d | KCS Gram | temporal-KCS] features;
WGAN training with weight clipping (MODEL.CLIP_VALUE) and N_CRITIC critic
steps per generator step.

Both steps are jitted; the critic's weight clip is a tree-map inside the
critic step (the reference clamps after each optimizer step,
train3D_GAN.py WGAN recipe).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.legends import KC_MATRIX
from ..models.triangulation import Discriminator
from ..parallel.train_step import TrainState
from .trainer3d import Trainer3D, build_projections, make_train_step_3d


def critic_features(pose3d: jax.Array) -> jax.Array:
    """[pose3d | KCS Gram] feature vector (reference triangulation.py:20-44)."""
    kc = jnp.asarray(KC_MATRIX)
    bones = jnp.einsum("jk,bkc->bjc", kc, pose3d.astype(jnp.float32))
    gram = jnp.einsum("bjc,bkc->bjk", bones, bones)
    return jnp.concatenate(
        [pose3d.reshape(pose3d.shape[0], -1), gram.reshape(gram.shape[0], -1)], axis=1)


class TrainerGAN3D(Trainer3D):
    """Adds the WGAN critic loop on top of Trainer3D."""

    def __init__(self, cfg, model, train_loaders, val_loaders=None, **kw):
        super().__init__(cfg, model, train_loaders, val_loaders, **kw)
        self.n_critic = int(cfg.MODEL.N_CRITIC)
        self.clip_value = float(cfg.MODEL.CLIP_VALUE)
        self.gan_factor = float(cfg.LOSS.KCS_LOSS_FACTOR)

        self.critic = Discriminator()
        feat = critic_features(jnp.zeros((1, 21, 3)))
        cvars = self.critic.init(jax.random.key(2), feat)
        self.critic_tx = optax.rmsprop(5e-5)  # standard WGAN recipe
        self.critic_state = TrainState(
            step=jnp.zeros((), jnp.int32), params=cvars["params"],
            batch_stats={}, opt_state=self.critic_tx.init(cvars["params"]))
        self._build_gan_steps()

    def _build_gan_steps(self) -> None:
        cfg, model, critic = self.cfg, self.model, self.critic
        orig_size = self.orig_size
        clip = self.clip_value
        critic_tx = self.critic_tx
        gan_factor = self.gan_factor
        tx = self.tx

        def gen_pose3d(params, batch_stats, batch, rng):
            proj = build_projections(cfg, batch["intrinsic_matrix"],
                                     batch["extrinsic_matrices"], orig_size)
            out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                                 batch["images"], proj, True,
                                 rngs={"aug": rng}, mutable=["batch_stats"])
            return out.keypoints_3d

        @jax.jit
        def critic_step(critic_state: TrainState, gen_state: TrainState,
                        batch, rng) -> Tuple[TrainState, jax.Array]:
            fake = jax.lax.stop_gradient(
                gen_pose3d(gen_state.params, gen_state.batch_stats, batch, rng))
            real = batch["pose3d"]

            def loss_fn(cparams):
                d_fake = critic.apply({"params": cparams}, critic_features(fake))
                d_real = critic.apply({"params": cparams}, critic_features(real))
                return jnp.mean(d_fake) - jnp.mean(d_real)  # WGAN critic loss

            loss, grads = jax.value_and_grad(loss_fn)(critic_state.params)
            updates, new_opt = critic_tx.update(grads, critic_state.opt_state,
                                                critic_state.params)
            new_params = optax.apply_updates(critic_state.params, updates)
            new_params = jax.tree.map(lambda p: jnp.clip(p, -clip, clip), new_params)
            return TrainState(step=critic_state.step + 1, params=new_params,
                              batch_stats={}, opt_state=new_opt), loss

        base_step = make_train_step_3d(cfg, model, tx, orig_size)

        @jax.jit
        def gen_adv_step(gen_state: TrainState, critic_state: TrainState,
                         batch, rng) -> Tuple[TrainState, Dict]:
            def loss_fn(params):
                pose3d = gen_pose3d(params, gen_state.batch_stats, batch, rng)
                d_fake = critic.apply({"params": critic_state.params},
                                      critic_features(pose3d))
                return -gan_factor * jnp.mean(d_fake)

            adv, grads = jax.value_and_grad(loss_fn)(gen_state.params)
            updates, new_opt = tx.update(grads, gen_state.opt_state, gen_state.params)
            new_params = optax.apply_updates(gen_state.params, updates)
            return (TrainState(step=gen_state.step + 1, params=new_params,
                               batch_stats=gen_state.batch_stats, opt_state=new_opt),
                    {"adv_loss": adv})

        self._critic_step = critic_step
        self._gen_adv_step = gen_adv_step
        self._base_step = base_step

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        from ..data.pipeline import device_prefetch
        from .metrics import AverageMeter

        meter = AverageMeter()
        for name, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            for i, batch in enumerate(device_prefetch(iter(loader), self.mesh)):
                sb = self._batch_for_step(batch)
                self.rng, r1, r2, r3 = jax.random.split(self.rng, 4)
                # N_CRITIC critic updates per generator step (WGAN)
                closs = 0.0
                for _ in range(self.n_critic):
                    self.critic_state, cl = self._critic_step(
                        self.critic_state, self.state, sb, r1)
                    closs = float(cl)
                # supervised generator step + adversarial term
                self.state, losses = self._base_step(self.state, sb, r2)
                self.state, adv = self._gen_adv_step(self.state, self.critic_state, sb, r3)
                host = {**{k: float(v) for k, v in losses.items()},
                        "critic_loss": closs, "adv_loss": float(adv["adv_loss"])}
                if i % int(self.cfg.PRINT_FREQ) == 0:
                    meter.update(host)
                    self.logger.info(
                        "GAN Epoch[%d] %s[%d/%d] %s", epoch, name, i, len(loader),
                        " ".join(f"{k}={v:.4f}" for k, v in host.items()))
        return meter.averages()
