"""CAE training loop with Keras-parity callback semantics, sharded via pjit.

Reproduces the reference training procedure (CAE_improved_modeltrain.py:
231-302): 80/20 split (sklearn train_test_split, seed 42), batch 32,
steps_per_epoch = len(train)//32, up to 100 epochs, MSE loss + MAE metric,
and the three callbacks with exact Keras semantics:

- EarlyStopping(monitor=val_loss, patience=10, restore_best_weights=True):
  wait increments on non-improvement (strict <), stop when wait >= patience.
- ModelCheckpoint(save_best_only): best-val weights handed to `save_best_fn`
  whenever val_loss strictly improves.
- ReduceLROnPlateau(factor=0.5, patience=5, min_lr=1e-6, min_delta=1e-4):
  improvement means current < best - min_delta; on wait >= patience the lr
  is halved (floored at min_lr) and wait resets.

TPU-first: the train step is one jitted graph (augment -> forward ->
MSE/MAE -> Adam update) with donated state; data parallelism shards the batch
across the mesh's 'data' axis with parameters replicated — XLA inserts the
gradient psums (SURVEY.md section 2.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import train_test_split

from cell_image_analysis_tpu.config import AugmentConfig, CAEConfig, TrainConfig
from cell_image_analysis_tpu.models.cae import CAE, init_cae
from cell_image_analysis_tpu.train.augment import augment_batch


@dataclass
class History:
    """Keras-style history record."""

    history: dict = field(default_factory=lambda: {
        "loss": [], "mae": [], "val_loss": [], "val_mae": [], "lr": []
    })

    def append(self, **kw):
        for k, v in kw.items():
            self.history[k].append(float(v))


def make_optimizer(cae_cfg: CAEConfig):
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=cae_cfg.learning_rate, b1=0.9, b2=0.999, eps=cae_cfg.adam_eps
    )


@partial(jax.jit, static_argnames=("model", "tx", "aug_cfg"), donate_argnums=(1, 2, 3))
def train_step(model: CAE, params, batch_stats, opt_state, batch, key, tx, aug_cfg):
    batch = augment_batch(key, batch, aug_cfg)

    def loss_fn(p):
        (recon, _), updates = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=True,
            mutable=["batch_stats"],
        )
        diff = batch - recon
        loss = jnp.mean(diff * diff)
        mae = jnp.mean(jnp.abs(diff))
        return loss, (mae, updates["batch_stats"])

    (loss, (mae, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_bs, opt_state, loss, mae


@partial(jax.jit, static_argnames=("model",))
def eval_metrics(model: CAE, params, batch_stats, x):
    recon, _ = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    diff = x - recon
    return jnp.mean(diff * diff), jnp.mean(jnp.abs(diff))


def fit_cae(
    cells: np.ndarray,
    cae_cfg: CAEConfig = CAEConfig(),
    train_cfg: TrainConfig = TrainConfig(),
    aug_cfg: AugmentConfig = AugmentConfig(),
    save_best_fn: Optional[Callable[[dict], None]] = None,
    verbose: bool = True,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
):
    """Train the CAE on (N, 64, 64) or (N, 64, 64, 1) cell images.

    Returns (model, variables, history) where `variables` holds the
    best-val weights (EarlyStopping restore semantics) and history mirrors
    Keras History.history.
    """
    X = np.asarray(cells, dtype=np.float32)
    if X.ndim == 3:
        X = X[..., None]  # reference: np.expand_dims(cell_images, axis=-1)

    X_train, X_val = train_test_split(
        X, test_size=train_cfg.val_split, random_state=train_cfg.seed
    )
    bs = train_cfg.batch_size
    steps = max(1, len(X_train) // bs)

    key = jax.random.PRNGKey(train_cfg.seed)
    key, init_key = jax.random.split(key)
    model, variables = init_cae(
        init_key,
        input_size=X.shape[1],
        encoder_filters=cae_cfg.encoder_filters,
        decoder_filters=cae_cfg.decoder_filters,
        bn_momentum=cae_cfg.bn_momentum,
        bn_epsilon=cae_cfg.bn_epsilon,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = make_optimizer(cae_cfg)
    opt_state = tx.init(params)

    if mesh is not None:
        # replicate params across the mesh; batches are sharded per step
        from cell_image_analysis_tpu.parallel.sharding import replicate
        params, batch_stats, opt_state = replicate(mesh, (params, batch_stats, opt_state))

    X_val_j = jnp.asarray(X_val)
    history = History()
    lr = cae_cfg.learning_rate

    best_val = np.inf            # EarlyStopping / ModelCheckpoint monitor
    best_weights = (params, batch_stats)
    es_wait = 0
    rlr_best = np.inf            # ReduceLROnPlateau has its own best/min_delta
    rlr_wait = 0
    stopped_epoch = 0
    start_epoch = 0
    rng = np.random.default_rng(train_cfg.seed)

    if resume and checkpoint_dir:
        from cell_image_analysis_tpu.train.checkpoint import load_checkpoint

        ck = load_checkpoint(checkpoint_dir)
        if ck is not None:
            params = ck["params"]
            batch_stats = ck["batch_stats"]
            opt_state = ck["opt_state"]
            key = ck["key"]
            lr = float(ck["lr"])
            best_val = float(ck["best_val"])
            best_weights = (ck["best_params"], ck["best_batch_stats"])
            es_wait, rlr_best, rlr_wait = ck["es_wait"], float(ck["rlr_best"]), ck["rlr_wait"]
            history.history = {k: list(v) for k, v in ck["history"].items()}
            start_epoch = int(ck["epoch"]) + 1
            rng.bit_generator.state = ck["np_rng_state"]
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            if verbose:
                print(f"Resuming training from epoch {start_epoch + 1}")

    for epoch in range(start_epoch, train_cfg.epochs):
        perm = rng.permutation(len(X_train))[: steps * bs].reshape(steps, bs)
        losses, maes = [], []
        for step in range(steps):
            key, sk = jax.random.split(key)
            batch = jnp.asarray(X_train[perm[step]])
            if mesh is not None:
                # shard the batch over 'data' (params are replicated); GSPMD
                # turns the BN/grad batch reductions into psums, so the math
                # equals the single-device step up to float reassociation
                # (asserted by tests/test_sharded_training.py)
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch = jax.device_put(
                    batch, NamedSharding(mesh, P("data", None, None, None))
                )
            params, batch_stats, opt_state, loss, mae = train_step(
                model, params, batch_stats, opt_state, batch, sk, tx, aug_cfg
            )
            losses.append(loss)
            maes.append(mae)
        train_loss = float(jnp.mean(jnp.stack(losses)))
        train_mae = float(jnp.mean(jnp.stack(maes)))
        val_loss, val_mae = (float(v) for v in eval_metrics(model, params, batch_stats, X_val_j))
        history.append(loss=train_loss, mae=train_mae, val_loss=val_loss, val_mae=val_mae, lr=lr)
        if verbose:
            print(
                f"Epoch {epoch + 1}/{train_cfg.epochs} - loss: {train_loss:.6f} - "
                f"mae: {train_mae:.6f} - val_loss: {val_loss:.6f} - val_mae: {val_mae:.6f}"
            )

        # ModelCheckpoint + EarlyStopping (strict improvement, min_delta=0)
        if val_loss < best_val:
            best_val = val_loss
            best_weights = (params, batch_stats)
            es_wait = 0
            if save_best_fn is not None:
                save_best_fn({"params": params, "batch_stats": batch_stats})
        else:
            es_wait += 1
            if es_wait >= train_cfg.early_stop_patience:
                stopped_epoch = epoch + 1
                if verbose:
                    print(f"Epoch {epoch + 1}: early stopping (restoring best weights)")
                break

        # ReduceLROnPlateau
        if val_loss < rlr_best - train_cfg.reduce_lr_min_delta:
            rlr_best = val_loss
            rlr_wait = 0
        else:
            rlr_wait += 1
            if rlr_wait >= train_cfg.reduce_lr_patience:
                new_lr = max(lr * train_cfg.reduce_lr_factor, train_cfg.reduce_lr_min_lr)
                if new_lr < lr:
                    lr = new_lr
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
                    if verbose:
                        print(f"Epoch {epoch + 1}: ReduceLROnPlateau reducing lr to {lr:.2e}")
                rlr_wait = 0

        if checkpoint_dir:
            from cell_image_analysis_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, dict(
                epoch=epoch, params=params, batch_stats=batch_stats,
                opt_state=opt_state, key=key, lr=lr, best_val=best_val,
                best_params=best_weights[0], best_batch_stats=best_weights[1],
                es_wait=es_wait, rlr_best=rlr_best, rlr_wait=rlr_wait,
                history=history.history, np_rng_state=rng.bit_generator.state,
            ))

    # EarlyStopping(restore_best_weights=True)
    params, batch_stats = best_weights
    variables = {"params": params, "batch_stats": batch_stats}
    return model, variables, history
