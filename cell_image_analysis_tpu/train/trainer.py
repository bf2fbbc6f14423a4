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


@dataclass
class KerasCallbackState:
    """EarlyStopping + ModelCheckpoint + ReduceLROnPlateau as one explicit
    state machine with Keras-exact semantics, monitor='val_loss', mode='min'
    (reference callback construction: CAE_improved_modeltrain.py:263-283).

    Semantics adjudicated against the real keras.callbacks implementations
    driven with identical val-loss sequences in tests/test_keras_callbacks.py:
    - EarlyStopping(min_delta=0): improvement is strict `<`; wait resets on
      improvement, stop when wait >= patience.
    - ModelCheckpoint(save_best_only): save exactly when val improves.
    - ReduceLROnPlateau: improvement is `current < best - min_delta`; after
      `patience` stale epochs lr -> max(lr*factor, min_lr); wait resets only
      when the lr actually moved (Keras attempts a no-op reduction every
      epoch once lr sits at min_lr).
    """

    lr: float
    es_patience: int = 10
    rlr_patience: int = 5
    rlr_factor: float = 0.5
    rlr_min_lr: float = 1e-6
    rlr_min_delta: float = 1e-4
    best_val: float = np.inf
    es_wait: int = 0
    rlr_best: float = np.inf
    rlr_wait: int = 0

    def on_epoch_end(self, val_loss: float) -> tuple[bool, bool, bool]:
        """Returns (improved, stop, lr_reduced); on lr_reduced read the new
        rate from `.lr`."""
        # Keras 3 monitor_op is keras.ops.less: the comparison happens in
        # FLOAT32 (python-float logs are cast to f32 tensors), so values
        # within f32 eps of the best tie instead of improving
        improved = bool(np.float32(val_loss) < np.float32(self.best_val))
        if improved:
            self.best_val = val_loss
            self.es_wait = 0
        else:
            self.es_wait += 1
        stop = self.es_wait >= self.es_patience

        lr_reduced = False
        # Keras 3 negates min_delta for mode='min' and tests
        # `current - min_delta < best` — i.e. current + min_delta < best,
        # with the python-float64 sum then compared in f32 by keras.ops.less.
        # Same math as `current < best - min_delta` but NOT the same
        # rounding; sequences stepping by ~min_delta sit exactly on the edge
        if bool(np.float32(val_loss + self.rlr_min_delta)
                < np.float32(self.rlr_best)):
            self.rlr_best = val_loss
            self.rlr_wait = 0
        else:
            self.rlr_wait += 1
            if self.rlr_wait >= self.rlr_patience:
                new_lr = max(self.lr * self.rlr_factor, self.rlr_min_lr)
                if new_lr < self.lr:
                    self.lr = new_lr
                    lr_reduced = True
                    self.rlr_wait = 0
        return improved, stop, lr_reduced


from functools import lru_cache


@lru_cache(maxsize=None)
def _make_optimizer_cached(lr: float, eps: float):
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=eps
    )


def make_optimizer(cae_cfg: CAEConfig):
    """Identity-stable per (lr, eps): `tx` is a STATIC argname of the jitted
    train graphs and GradientTransformation hashes by its closure identities,
    so a fresh tx per fit_cae call would re-trace (and re-fetch the remote
    compile of) the whole epoch graph on every fit (ADVICE r4 #5 — this
    biased the train bench low and cost ~1 s per repeat fit on the tunnel).
    The transformation itself is stateless; sharing it across fits is safe."""
    return _make_optimizer_cached(cae_cfg.learning_rate, cae_cfg.adam_eps)


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


def _epoch_scan(model: CAE, params, batch_stats, opt_state, batches, keys, tx, aug_cfg):
    """One EPOCH as `lax.scan` of the train step over the pre-shuffled
    (steps, bs, H, W, 1) batch tensor + per-step augment keys.

    Bit-identical to `steps` sequential `train_step` calls (same key
    sequence, same update order — scan is sequential), but ONE dispatch
    instead of `steps`: on the remote-attached chip each dispatch costs a
    ~35 ms tunnel round trip, which made the per-step loop tunnel-bound
    (measured 557.8 cells/s at batch 32 vs the ~920 ceiling the dispatch
    floor alone imposes; BENCH.md r4s6)."""

    def body(carry, xs):
        p, bs_, opt = carry
        batch, key = xs
        batch = augment_batch(key, batch, aug_cfg)

        def loss_fn(pp):
            (recon, _), updates_ = model.apply(
                {"params": pp, "batch_stats": bs_}, batch, train=True,
                mutable=["batch_stats"],
            )
            diff = batch - recon
            loss = jnp.mean(diff * diff)
            mae = jnp.mean(jnp.abs(diff))
            return loss, (mae, updates_["batch_stats"])

        (loss, (mae, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt = tx.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return (p, new_bs, opt), (loss, mae)

    (params, batch_stats, opt_state), (losses, maes) = jax.lax.scan(
        body, (params, batch_stats, opt_state), (batches, keys)
    )
    return params, batch_stats, opt_state, losses, maes


@partial(jax.jit, static_argnames=("model", "tx", "aug_cfg"), donate_argnums=(1, 2, 3))
def train_epoch(model: CAE, params, batch_stats, opt_state, batches, keys, tx, aug_cfg):
    """Mesh-path epoch dispatch: callers pre-shuffle and shard `batches`."""
    return _epoch_scan(model, params, batch_stats, opt_state, batches, keys, tx, aug_cfg)


@partial(jax.jit, static_argnames=("model", "tx", "aug_cfg"), donate_argnums=(1, 2, 3))
def train_epoch_resident(model: CAE, params, batch_stats, opt_state, X, perm,
                         keys, X_val, tx, aug_cfg):
    """Single-device epoch with DEVICE-RESIDENT data (BENCH.md r5s1): the
    per-epoch host work is reduced to shipping the (steps, bs) int32
    permutation (~6 KB) and ONE consolidated metric fetch.

    The naive loop shipped `X_train[perm]` (~26 MB at n=2048) through the
    ~100 ms/MB tunnel every epoch and then paid FOUR separate float()
    round trips for the history — ~2.7 s/epoch of pure transfer against
    ~0.15 s of device compute.  Here X stays in HBM across epochs, the
    shuffle is an on-device leading-axis row gather (exact selection —
    bit-identical batches), and the epoch-end val evaluation (Keras
    train=False semantics, eval_metrics' math) is fused into the same
    dispatch, returning all four scalars as one (4,) array."""
    batches = X[perm]                     # (steps, bs, H, W, 1) on device
    params, batch_stats, opt_state, losses, maes = _epoch_scan(
        model, params, batch_stats, opt_state, batches, keys, tx, aug_cfg)
    recon, _ = model.apply({"params": params, "batch_stats": batch_stats},
                           X_val, train=False)
    diff = X_val - recon
    metrics = jnp.stack([jnp.mean(losses), jnp.mean(maes),
                         jnp.mean(diff * diff), jnp.mean(jnp.abs(diff))])
    return params, batch_stats, opt_state, metrics


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

    cbs = KerasCallbackState(
        lr=lr,
        es_patience=train_cfg.early_stop_patience,
        rlr_patience=train_cfg.reduce_lr_patience,
        rlr_factor=train_cfg.reduce_lr_factor,
        rlr_min_lr=train_cfg.reduce_lr_min_lr,
        rlr_min_delta=train_cfg.reduce_lr_min_delta,
    )
    # copy for the same donation-aliasing reason as the per-epoch snapshot
    # below (epoch 0's train_epoch call donates these exact buffers)
    best_weights = jax.tree_util.tree_map(jnp.copy, (params, batch_stats))
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
            lr = cbs.lr = float(ck["lr"])
            cbs.best_val = float(ck["best_val"])
            best_weights = (ck["best_params"], ck["best_batch_stats"])
            cbs.es_wait, cbs.rlr_best, cbs.rlr_wait = (
                ck["es_wait"], float(ck["rlr_best"]), ck["rlr_wait"]
            )
            history.history = {k: list(v) for k, v in ck["history"].items()}
            start_epoch = int(ck["epoch"]) + 1
            rng.bit_generator.state = ck["np_rng_state"]
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            if verbose:
                print(f"Resuming training from epoch {start_epoch + 1}")

    # single-device path: the training set lives in HBM across epochs (see
    # train_epoch_resident — the per-epoch 26 MB batch upload was the
    # dominant cost on the tunnel-attached chip)
    X_train_dev = jnp.asarray(X_train) if mesh is None else None

    for epoch in range(start_epoch, train_cfg.epochs):
        perm = rng.permutation(len(X_train))[: steps * bs].reshape(steps, bs)
        # same key sequence as the historical per-step loop (bit-identical
        # augmentation), then ONE scanned dispatch for the whole epoch
        # (_epoch_scan docstring: the per-step loop was tunnel-bound)
        step_keys = []
        for _ in range(steps):
            key, sk = jax.random.split(key)
            step_keys.append(sk)
        step_keys = jnp.stack(step_keys)
        if mesh is not None:
            # shard the batch dim over 'data' (params are replicated); GSPMD
            # turns the BN/grad batch reductions into psums, so the math
            # equals the single-device step up to float reassociation
            # (asserted by tests/test_sharded_training.py)
            from jax.sharding import NamedSharding, PartitionSpec as P

            batches = jax.device_put(
                jnp.asarray(X_train[perm]),
                NamedSharding(mesh, P(None, "data", None, None, None))
            )
            params, batch_stats, opt_state, losses, maes = train_epoch(
                model, params, batch_stats, opt_state, batches, step_keys, tx,
                aug_cfg,
            )
            train_loss = float(jnp.mean(losses))
            train_mae = float(jnp.mean(maes))
            val_loss, val_mae = (float(v) for v in eval_metrics(
                model, params, batch_stats, X_val_j))
        else:
            params, batch_stats, opt_state, metrics = train_epoch_resident(
                model, params, batch_stats, opt_state, X_train_dev,
                jnp.asarray(perm), step_keys, X_val_j, tx, aug_cfg,
            )
            train_loss, train_mae, val_loss, val_mae = (
                float(v) for v in np.asarray(metrics))  # ONE host fetch
        history.append(loss=train_loss, mae=train_mae, val_loss=val_loss, val_mae=val_mae, lr=lr)
        if verbose:
            print(
                f"Epoch {epoch + 1}/{train_cfg.epochs} - loss: {train_loss:.6f} - "
                f"mae: {train_mae:.6f} - val_loss: {val_loss:.6f} - val_mae: {val_mae:.6f}"
            )

        # Keras callback triple (EarlyStopping + ModelCheckpoint +
        # ReduceLROnPlateau); Keras runs every callback's on_epoch_end even
        # on the stopping epoch, so the lr update applies before the break
        improved, stop, lr_reduced = cbs.on_epoch_end(val_loss)
        if improved:
            # deep-copy: train_epoch donates params/batch_stats, so a bare
            # reference would alias buffers the NEXT epoch's call deletes on
            # backends that honor donation (the real TPU — the CPU mesh
            # ignores donation, so tests can't see the 'Array has been
            # deleted' this would raise at restore/checkpoint time)
            best_weights = jax.tree_util.tree_map(jnp.copy, (params, batch_stats))
            if save_best_fn is not None:
                save_best_fn({"params": best_weights[0],
                              "batch_stats": best_weights[1]})
        if lr_reduced:
            lr = cbs.lr
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            if verbose:
                print(f"Epoch {epoch + 1}: ReduceLROnPlateau reducing lr to {lr:.2e}")
        if stop:
            stopped_epoch = epoch + 1
            if verbose:
                print(f"Epoch {epoch + 1}: early stopping (restoring best weights)")
            break

        if checkpoint_dir:
            from cell_image_analysis_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, dict(
                epoch=epoch, params=params, batch_stats=batch_stats,
                opt_state=opt_state, key=key, lr=lr, best_val=cbs.best_val,
                best_params=best_weights[0], best_batch_stats=best_weights[1],
                es_wait=cbs.es_wait, rlr_best=cbs.rlr_best, rlr_wait=cbs.rlr_wait,
                history=history.history, np_rng_state=rng.bit_generator.state,
            ))

    # EarlyStopping(restore_best_weights=True)
    params, batch_stats = best_weights
    variables = {"params": params, "batch_stats": batch_stats}
    return model, variables, history
