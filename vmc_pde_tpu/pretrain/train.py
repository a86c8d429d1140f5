"""Supervised pre-training of the flow by maximum likelihood (cross-entropy)
on data samples.

Parity with vmc_fluids/train.py:16-67 (synthetic data generators with analytic
targets + adam fitting loop), modernized: optax replaces the removed
jax.experimental.optimizers, and the epoch/minibatch loop runs as jitted
update steps on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def gen_data(size, mode: str = "standard_normal", key: int = 0, std: float = 1.0):
    """Synthetic datasets with analytic target density (train.py:16-34).
    ``size`` is (N, dim)."""
    k = jax.random.PRNGKey(key)
    dim = size[-1]
    if mode == "standard_normal":
        data = std * jax.random.normal(k, shape=size)

        def target_fun(x):
            return (
                1.0 / jnp.sqrt(2 * jnp.pi * std**2) ** dim
                * jnp.exp(-0.5 * jnp.sum(x**2, axis=-1) / std**2)
            )

        return data, target_fun

    if mode == "normal_superpos":
        shift = 4.0
        data = std * jax.random.normal(k, shape=size)
        data = data.at[::2].add(shift)
        data = data.at[1::2].add(-shift)

        def target_fun(x):
            g = 1.0 / jnp.sqrt(2 * jnp.pi * std**2) ** dim
            return 0.5 * g * (
                jnp.exp(-0.5 * jnp.sum((x - shift) ** 2, axis=-1) / std**2)
                + jnp.exp(-0.5 * jnp.sum((x + shift) ** 2, axis=-1) / std**2)
            )

        return data, target_fun

    raise ValueError(f"unknown data mode {mode!r}")


def train(
    state,
    data,
    batchsize: int = 100,
    epochs: int = 100,
    key: int = 0,
    lr: float = 1e-3,
    verbose: bool = False,
    workdir=None,
    checkpoint_every: int = 0,
    resume: bool = False,
    grid=None,
    check_every: int = 50,
    target_fun=None,
):
    """Fit state.flow to ``data`` (N, dim) by minimizing -E[log p]
    (train.py:37-59). Mutates state.params; returns the per-epoch losses.

    ``workdir`` + ``checkpoint_every`` persist {params, opt_state, epoch} as
    an orbax pytree checkpoint every N epochs (and at the end); ``resume``
    restores the latest one before training (the reference never persisted
    pretrained weights, SURVEY.md section 5.4).

    ``grid`` (a utils.grid.Grid) enables the reference's periodic training
    diagnostics (train.py:52-58): every ``check_every`` epochs the grid
    quadrature of the model density is computed (should approach 1) and --
    when ``workdir`` is set -- a density snapshot (plus a model-target diff
    when ``target_fun`` is given) is saved as fit_epoch{N}.pdf."""
    flow = state.flow
    params = state.params
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(key)

    epoch0 = 0
    if workdir is not None:
        import os

        from ..utils.checkpoint import load_pytree, save_pytree

        ckpt_path = os.path.join(workdir, "pretrain_ckpt")
        if resume and os.path.exists(ckpt_path):
            tree = load_pytree(ckpt_path, dict(params=params,
                                               opt_state=opt_state,
                                               epoch=0))
            params, opt_state = tree["params"], tree["opt_state"]
            epoch0 = int(tree["epoch"])
            if verbose:
                print(f"resumed pretraining from epoch {epoch0}")

    def loss_fn(p, batch):
        return -jnp.mean(jax.vmap(flow.log_prob, in_axes=(None, 0))(p, batch))

    @jax.jit
    def update(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        upd, o = opt.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    grid_integrals = []
    if grid is not None:
        coords = jnp.asarray(grid.coords, dtype=data.dtype)
        bin_area = float(grid.bin_area)

        @jax.jit
        def _grid_integral(p):
            lp = jax.vmap(flow.log_prob, in_axes=(None, 0))(p, coords)
            return jnp.sum(bin_area * jnp.exp(lp))

    def _periodic_check(epoch_done, params):
        """Reference train.py:52-58: grid integral + density snapshot every
        ``check_every`` epochs (plots to files instead of plt.show)."""
        integral = float(_grid_integral(params))
        grid_integrals.append((epoch_done, integral))
        if verbose:
            print(f"epoch {epoch_done}: grid integral {integral:.6f}")
        if workdir is not None:
            import os

            import matplotlib.pyplot as plt

            from ..viz.plots import plot_density, plot_diff

            state.params = params
            fig = plot_density(state, grid, proj=False)
            fig.savefig(os.path.join(workdir, f"fit_epoch{epoch_done}.pdf"))
            plt.close(fig)
            if target_fun is not None:
                fig = plot_diff(state, grid, target_fun)
                fig.savefig(
                    os.path.join(workdir, f"fit_diff_epoch{epoch_done}.pdf"))
                plt.close(fig)

    n = data.shape[0] - data.shape[0] % batchsize
    losses = []
    for epoch in range(epoch0, epochs):
        # purely epoch-indexed key: a resumed run shuffles identically
        k = jax.random.fold_in(rng, epoch)
        perm = jax.random.permutation(k, data.shape[0])[:n]
        batches = data[perm].reshape(-1, batchsize, data.shape[-1])
        loss = None
        for batch in batches:
            params, opt_state, loss = update(params, opt_state, batch)
        losses.append(float(loss))
        if verbose:
            print(f"epoch {epoch}: loss {losses[-1]:.6f}")
        if grid is not None and (epoch + 1) % max(check_every, 1) == 0:
            _periodic_check(epoch + 1, params)
        if (workdir is not None and checkpoint_every
                and (epoch + 1) % checkpoint_every == 0):
            save_pytree(workdir, "pretrain_ckpt",
                        dict(params=params, opt_state=opt_state,
                             epoch=epoch + 1))

    if workdir is not None and checkpoint_every:
        save_pytree(workdir, "pretrain_ckpt",
                    dict(params=params, opt_state=opt_state, epoch=epochs))
    state.params = params
    if grid is not None:
        # (epoch, integral) pairs of the periodic normalization checks
        state.pretrain_grid_integrals = grid_integrals
    return losses


def main(argv=None):
    """CLI: fit a fresh flow to a synthetic dataset and report the KL-ish
    losses (the reference's train.py workflow, main.py:120-125)."""
    import argparse

    import jax

    from ..models.state import make_var_state
    from ..parallel.mesh import ParallelCtx
    from ..utils.dtypes import resolve

    p = argparse.ArgumentParser(description="supervised flow pre-training")
    p.add_argument("--dim", type=int, default=2)
    p.add_argument("--mode", choices=["standard_normal", "normal_superpos"],
                   default="standard_normal")
    p.add_argument("--std", type=float, default=1.0)
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batchsize", type=int, default=100)
    p.add_argument("--precision", default="f32")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--variant", default="affine",
                   help="coupling variant; must match the evolution "
                        "flow when the checkpoint feeds --init-params "
                        "(e.g. 'scale' for the mwe/diffusion presets)")
    p.add_argument("--workdir", default=None,
                   help="persist {params, opt_state, epoch} as an orbax "
                        "checkpoint here (consumable by the driver's "
                        "--init-params)")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    prec = resolve(args.precision)
    state = make_var_state(args.seed, args.dim, depth=args.depth,
                           variant=args.variant,
                           ctx=ParallelCtx.create(), precision=prec)
    data, target = gen_data((args.n, args.dim), mode=args.mode, std=args.std)
    data = data.astype(prec.compute)
    losses = train(state, data, batchsize=args.batchsize,
                   epochs=args.epochs, lr=args.lr, verbose=True,
                   workdir=args.workdir,
                   checkpoint_every=args.checkpoint_every,
                   resume=args.resume)
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f}")
    return losses


if __name__ == "__main__":
    main()
