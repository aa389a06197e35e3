"""Batched linear-assignment solve by synchronous auction with eps-scaling.

Replaces the reference's external Munkres/Hungarian library call
(``include/dsp_dynamic.h:1474-1475``, ``libmunkres.a`` per
``CMakeLists.txt:31-34``) with a vectorized Bertsekas auction: all unassigned
rows bid simultaneously for their best column (bid = value gap to the
second-best plus eps), columns go to the highest bidder, and eps is annealed
so the final assignment is optimal up to ``n * eps_final`` -- below the cost
quantum of the reference's gated cost matrix (costs are ``dist/gate * 1000``
or the gate penalty 7500, ``dsp_dynamic.h:1462-1470``), so ties aside it
reproduces the Munkres result.  Everything is fixed-shape ``lax.while_loop``
with a hard iteration bound; rows left unassigned at the bound report no
match (a conservative degradation the downstream birth logic already
tolerates -- unmatched clusters keep the velocity sentinel,
``dsp_dynamic.h:1497``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1.0e9


@partial(jax.jit, static_argnames=("max_iters",))
def auction_assignment(
    cost: jnp.ndarray,  # [R, C] finite costs (smaller = better)
    row_valid: jnp.ndarray,  # [R] bool
    col_valid: jnp.ndarray,  # [C] bool
    max_iters: int = 600,
) -> jnp.ndarray:
    """Min-cost one-to-one assignment.  Returns ``col_of_row[R]`` (-1 = none).

    Rows in excess of the valid-column count stay unassigned, mirroring a
    rectangular Munkres solve.
    """
    R, C = cost.shape
    benefit = jnp.where(
        row_valid[:, None] & col_valid[None, :], -cost.astype(jnp.float32), NEG
    )
    spread = jnp.maximum(jnp.max(jnp.where(benefit > NEG, cost, 0.0)), 1.0)
    eps_phases = 6
    n_valid_cols = jnp.sum(col_valid)

    def run_phase(carry, phase):
        assign, prices = carry
        eps = spread / (4.0**phase.astype(jnp.float32)) / 5.0 + 1e-3
        assign = jnp.full((R,), -1, jnp.int32)  # restart assignment each phase
        col_owner = jnp.full((C,), -1, jnp.int32)

        def body(st):
            assign, col_owner, prices, it = st
            value = benefit - prices[None, :]
            unassigned = row_valid & (assign < 0)
            best_col = jnp.argmax(value, axis=1)
            best_val = jnp.max(value, axis=1)
            second_val = jnp.max(
                jnp.where(
                    jax.nn.one_hot(best_col, C, dtype=bool), NEG, value
                ),
                axis=1,
            )
            bid = jnp.where(unassigned, best_val - second_val + eps, NEG)
            # Column awards: highest bidder per column wins.
            bid_col = jnp.where(unassigned, best_col, C)
            bid_matrix = jnp.full((C + 1, R), NEG).at[bid_col, jnp.arange(R)].set(
                jnp.where(unassigned, bid, NEG)
            )[:C]
            winner = jnp.argmax(bid_matrix, axis=1)  # [C]
            won = jnp.max(bid_matrix, axis=1) > NEG / 2
            new_prices = jnp.where(won, prices + jnp.max(bid_matrix, axis=1), prices)
            # Evict previous owners of claimed columns, then assign winners.
            claimed_owner = jnp.where(won, col_owner, -1)
            assign = jnp.where(
                jnp.isin(jnp.arange(R), claimed_owner), -1, assign
            )
            new_owner = jnp.where(won, winner, col_owner)
            assign = assign.at[jnp.where(won, winner, R)].set(
                jnp.arange(C, dtype=jnp.int32), mode="drop"
            )
            return assign, new_owner, new_prices, it + 1

        def cond(st):
            assign, _, _, it = st
            n_unassigned = jnp.sum(row_valid & (assign < 0))
            # Stop when all rows that *can* be assigned are assigned.
            assignable = jnp.minimum(jnp.sum(row_valid), n_valid_cols)
            return (jnp.sum(row_valid & (assign >= 0)) < assignable) & (
                it < max_iters
            )

        assign, col_owner, prices, _ = jax.lax.while_loop(
            cond, body, (assign, col_owner, prices, jnp.int32(0))
        )
        return (assign, prices), None

    (assign, _), _ = jax.lax.scan(
        run_phase,
        (jnp.full((R,), -1, jnp.int32), jnp.zeros((C,), jnp.float32)),
        jnp.arange(eps_phases),
    )
    return assign
