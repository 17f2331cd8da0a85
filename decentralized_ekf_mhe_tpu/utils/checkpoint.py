"""Checkpoint / resume for estimator carries.

The reference has no checkpointing (SURVEY.md §5); its closest analogs are
MHEproblem::resetQP (MheSrb.cpp:734-760) and the arrival-cost pair (M_p, n_p)
— the compressed sufficient statistic of all marginalized history. Here the
whole estimator carry (EKF ring, MHE window tensors, arrival pair, Bezier
waypoints) is a small pytree of arrays, so long sweeps snapshot it as one
npz and resume bit-exactly. NamedTuple structure is rebuilt on load from the
flattened leaf order.
"""

from __future__ import annotations

import numpy as np

import jax


def save_carry(path: str, carry) -> None:
    """Snapshot any pytree-of-arrays carry to ``path`` (npz)."""
    leaves = jax.tree.leaves(carry)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    )


def load_carry(path: str, like):
    """Restore a carry saved by ``save_carry``; ``like`` provides the pytree
    structure and dtypes (e.g. a freshly initialized carry)."""
    import jax.numpy as jnp

    data = np.load(path)
    treedef = jax.tree.structure(like)
    like_leaves = jax.tree.leaves(like)
    leaves = []
    for i, ref in enumerate(like_leaves):
        key = f"leaf_{i}"
        if key in data:
            # Leaves are matched by flatten order, so a saved array whose
            # shape disagrees with the template leaf means the carry's
            # STRUCTURE changed in a non-trailing position (e.g. a nested
            # state gained fields) and every later leaf would silently load
            # into a shifted slot — refuse rather than resume wrong state.
            saved_shape = tuple(data[key].shape)
            ref_shape = tuple(np.shape(ref))
            if saved_shape != ref_shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {saved_shape} does not match "
                    f"the template's {ref_shape}; the carry structure changed "
                    f"in a non-trailing position — this snapshot cannot be "
                    f"resumed into the current carry type")
            leaves.append(jnp.asarray(data[key], getattr(ref, "dtype", None)))
        else:
            # Forward compatibility: a carry type may gain TRAILING fields
            # (e.g. MHEState's ADMM warm-start iterates z_adm/y_adm) after a
            # snapshot was written. Missing trailing leaves resume from the
            # template's values — correct for warm-start/diagnostic state,
            # whose zero/fresh value is a valid cold start.
            leaves.append(jnp.asarray(ref))
    return jax.tree.unflatten(treedef, leaves)
