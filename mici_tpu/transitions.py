"""Markov transition kernels.

Reference: mici/transitions.py (858 LoC).  Every transition is a pure
function ``sample(state, rng) -> (state, stats)`` over immutable pytree
state with an explicit JAX PRNG key; integrator failures arrive as error
bits on the state (not exceptions) and are folded into the statistics
dictionary (cf. ``_process_integrator_error``, mici/transitions.py:33-43).

The dynamic (NUTS) transitions re-derive the reference's *recursive*
binary-tree expansion (mici/transitions.py:645-770) as an **iterative**
algorithm compatible with ``lax.while_loop``/``vmap``:

* The doubling loop keeps only the two full edge states of the current
  trajectory tree plus its momentum sum and log weight.
* A subtree of depth ``d`` is built leaf-by-leaf; the termination checks the
  recursion performs at every internal node — the whole-subtree no-U-turn
  check plus the two *extra overlapping-subtree* checks of
  mici/transitions.py:561-590 — are reproduced exactly from leaf-index bit
  arithmetic: when leaf ``i`` completes aligned subtrees of scales
  ``l = 1..trailing_ones(i)``, the states and momentum prefix-sums needed
  by those checks are read from two O(max_tree_depth) checkpoint buffers
  (subtree *start* leaves, indexed by trailing-zero count, and completed
  *left-half end* leaves, indexed by trailing-one count).
* Progressive proposal sampling uses a per-leaf reservoir scheme that has
  exactly the same marginal distribution (proportional to leaf weights) as
  the reference's per-merge binary scheme.
* ``LogRepFloat`` tree weights (mici/utils.py:85-200) become plain
  log-space scalars combined with ``logaddexp``.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
from jax import lax

from mici_tpu import errors
from mici_tpu._pytree import register_pytree


def _where_tree(pred, a, b):
    """Select between two identically-structured pytrees elementwise."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b,
    )


def _select_batched(pred, a, b):
    """Select between two chain-batched pytrees with a per-chain predicate.

    ``pred`` has shape ``(n_chain,)``; leaves have shape
    ``(n_chain, ...)`` — the predicate is broadcast over each leaf's
    trailing dimensions.
    """

    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def _trailing_zeros(i):
    """Number of trailing zero bits of positive int32 ``i``."""
    lowest = i & -i
    return jnp.log2(lowest.astype(jnp.float32)).astype(jnp.int32)


@register_pytree(data_fields=("arr",))
class _TreePoint:
    """Trajectory point view over one packed ``(..., 3 * dim)`` array.

    Segments of the packed last axis are position, momentum and velocity
    (``system.dh_dmom`` at the point — cached so Riemannian termination
    criteria do not rebuild the metric).  Packing the three vectors into
    a single array keeps every checkpoint-buffer store/read and edge
    merge one kernel instead of three, and packing along the *last*
    (lane) axis keeps batched intermediates tiling-friendly on TPU — a
    ``(chains, 3, dim)`` stack pads the small trailing dims to the
    (8, 128) tile and measures ~35% slower end to end.
    """

    def __init__(self, arr):
        object.__setattr__(self, "arr", arr)

    @property
    def pos(self):
        d = self.arr.shape[-1] // 3
        return self.arr[..., :d]

    @property
    def mom(self):
        d = self.arr.shape[-1] // 3
        return self.arr[..., d:2 * d]

    @property
    def vel(self):
        d = self.arr.shape[-1] // 3
        return self.arr[..., 2 * d:]


class _VelocityProxySystem:
    """System proxy whose ``dh_dmom`` reads the cached point velocity.

    Lets the built-in termination criteria keep the reference signature
    ``criterion(system, state_1, state_2, sum_mom)``
    (mici/transitions.py:405-474) while operating on checkpointed points.
    """

    def dh_dmom(self, point):
        return point.vel


_VELOCITY_PROXY = _VelocityProxySystem()


def euclidean_no_u_turn_criterion(system, state_1, state_2, _sum_mom):
    """No-U-turn termination criterion for Euclidean manifolds.

    Reference: mici/transitions.py:405-436 (Hoffman & Gelman 2014).
    """
    diff = state_2.pos - state_1.pos
    return (jnp.sum(system.dh_dmom(state_1) * diff) < 0) | (
        jnp.sum(system.dh_dmom(state_2) * diff) < 0
    )


def riemannian_no_u_turn_criterion(system, state_1, state_2, sum_mom):
    """Generalized no-U-turn criterion on Riemannian manifolds.

    Reference: mici/transitions.py:439-474 (Betancourt 2013).
    """
    return (jnp.sum(system.dh_dmom(state_1) * sum_mom) < 0) | (
        jnp.sum(system.dh_dmom(state_2) * sum_mom) < 0
    )


class Transition(abc.ABC):
    """Base class for Markov transition kernels.

    Reference: mici/transitions.py:46-84.
    """

    @property
    @abc.abstractmethod
    def state_variables(self):
        """A set of names of state variables accessed by this transition."""

    @property
    def statistic_types(self):
        """Dict of statistic name -> (dtype, default) computed by sample."""
        return None

    @abc.abstractmethod
    def sample(self, state, rng):
        """Sample a new chain state from the Markov transition kernel.

        Args:
            state: Current (prepared) chain state.
            rng: JAX PRNG key.

        Returns:
            Tuple of (new state, statistics dict or None).
        """

    def _with_params(self, params):
        """Return self with per-chain parameter overrides applied.

        ``params`` is the adapter-controlled override dict for this
        transition (currently only ``step_size``); values may be traced
        per-chain scalars when applied inside a chain ``vmap``.
        """
        if params and "step_size" in params and hasattr(self, "integrator"):
            return self.replace(
                integrator=self.integrator.replace(
                    step_size=params["step_size"],
                ),
            )
        return self

    def sample_batch(self, states, rngs, params=None):
        """Sample the transition for a whole chain batch (leading axis).

        The default implementation is a ``vmap`` of :meth:`sample` with
        the per-chain parameter overrides applied inside the vmap —
        exactly the execution the chain driver's vmapped scan performs.
        Subclasses may override this with batch-level execution
        strategies that cannot be expressed per chain (e.g. the dynamic
        transitions' depth-tail re-batching, which gathers unfinished
        chains into a smaller fixed-slot batch mid-trajectory).

        Args:
            states: Chain states batched on the leading axis.
            rngs: Per-chain PRNG keys, shape ``(n_chain, ...)``.
            params: Optional dict of per-chain parameter override arrays
                (chain axis leading), e.g. ``{"step_size": array}``.

        Returns:
            Tuple of (batched new states, batched statistics dict or
            None).
        """
        params = {} if params is None else params

        def one(state, rng, p):
            return self._with_params(p).sample(state, rng)

        return jax.vmap(one)(states, rngs, params)


class MomentumTransition(Transition):
    """Base class for transitions leaving the momentum conditional invariant.

    Reference: mici/transitions.py:87-127.
    """

    @property
    def state_variables(self):
        return {"mom"}

    def __init__(self, system):
        self.system = system


@register_pytree(data_fields=("system",))
class IndependentMomentumTransition(MomentumTransition):
    """Independent momentum resampling. Reference: mici/transitions.py:129-142."""

    def sample(self, state, rng):
        return state.replace(
            mom=self.system.sample_momentum(state, rng),
        ), None


@register_pytree(data_fields=("system",),
                 static_fields=("mom_resample_coeff",))
class CorrelatedMomentumTransition(MomentumTransition):
    """Crank-Nicolson partial momentum refresh (Horowitz 1991).

    Reference: mici/transitions.py:145-198.
    """

    def __init__(self, system, mom_resample_coeff=1.0):
        if not 0 <= mom_resample_coeff <= 1:
            msg = ("mom_resample_coeff should have a value in the interval "
                   "[0, 1].")
            raise ValueError(msg)
        super().__init__(system)
        self.mom_resample_coeff = mom_resample_coeff

    def sample(self, state, rng):
        if state.mom is None or self.mom_resample_coeff == 1:
            return state.replace(
                mom=self.system.sample_momentum(state, rng),
            ), None
        if self.mom_resample_coeff != 0:
            mom_ind = self.system.sample_momentum(state, rng)
            new_mom = (
                state.mom * (1.0 - self.mom_resample_coeff**2) ** 0.5
                + self.mom_resample_coeff * mom_ind
            )
            return state.replace(mom=new_mom), None
        return state, None


class IntegrationTransition(Transition):
    """Base class for integration transitions.

    Reference: mici/transitions.py:201-254.
    """

    @property
    def state_variables(self):
        return {"pos", "mom", "dir"}

    def __init__(self, system, integrator):
        self.system = system
        self.integrator = integrator

    @property
    def statistic_types(self):
        return {
            "n_step": (jnp.int32, -1),
            "accept_stat": (float, jnp.nan),
            "non_reversible_step": (bool, False),
            "convergence_error": (bool, False),
            "step_size": (float, jnp.nan),
        }

    def _state_packer(self, state):
        """Flat-vector codec for tree states of ``state``'s structure.

        Tree states (edges, proposals, leaves) are carried through the
        NUTS loops as single lane-contiguous vectors packing
        ``(pos, mom, aux, variables)``: every masked select on a tree
        state is then one kernel instead of one per pytree leaf (~6 for
        a Euclidean state, more for Riemannian aux), which measures
        ~2x on small-dimension targets where per-kernel cost dominates.
        ``dir`` is not packed — within a subtree it equals the build
        direction, which the unpacker reinstates — and ``error`` is
        transient (leaves enter the tree cleared).

        Returns ``(pack, unpack)`` with ``pack(state) -> flat`` and
        ``unpack(flat, dir) -> ChainState``.
        """
        import jax.flatten_util as jfu

        template = state
        _, unravel = jfu.ravel_pytree(
            (state.pos, state.mom, state.aux, state.variables),
        )
        zero_error = jnp.zeros_like(state.error)

        def pack(s):
            return jfu.ravel_pytree((s.pos, s.mom, s.aux, s.variables))[0]

        def unpack(flat, dir):
            pos, mom, aux, variables = unravel(flat)
            return template.replace(
                pos=pos, mom=mom, aux=aux, variables=variables,
                dir=dir, error=zero_error,
            )

        return pack, unpack



def _error_flags(error_bits):
    """Split an error bitmask into the reference's statistic flags."""
    return {
        "diverging": (error_bits & errors.DIVERGENCE_BIT) != 0,
        "non_reversible_step":
            (error_bits & errors.NON_REVERSIBLE_BIT) != 0,
        "convergence_error":
            (error_bits & (errors.CONVERGENCE_BIT | errors.LINALG_BIT)) != 0,
    }


class MetropolisIntegrationTransition(IntegrationTransition):
    """HMC transition using a Metropolis accept step on an n-step trajectory.

    Reference: mici/transitions.py:256-315.  The proposal is the trajectory
    endpoint with negated integration direction (involution); the direction
    is deterministically negated again after the accept decision.
    """

    @property
    def statistic_types(self):
        types = super().statistic_types
        types["metrop_accept_prob"] = (float, jnp.nan)
        return types

    def _sample_n_step(self, state, n_step, rng):
        state = state.clear_error()
        h_init = self.system.h(state)
        # Trajectory states ride through the step loop as flat-packed
        # vectors (see _state_packer): the on-failure/accept selects are
        # then one kernel each instead of one per state pytree leaf.
        pack, unpack = self._state_packer(state)
        dir0 = state.dir
        flat0 = pack(state)

        def cond(carry):
            flat, i, error_bits = carry
            return (i < n_step) & (error_bits == 0)

        def body(carry):
            flat, i, _ = carry
            stepped = self.integrator.step(unpack(flat, dir0))
            failed = stepped.error != 0
            # On failure keep the pre-step state (the trajectory ends) but
            # retain error bits for the statistics.
            flat_next = jnp.where(failed, flat, pack(stepped))
            return (flat_next, i + 1, stepped.error)

        flat_p, n_done, error_bits = lax.while_loop(
            cond, body, (flat0, jnp.int32(0), jnp.int32(0)),
        )
        flags = _error_flags(error_bits)
        integration_error = error_bits != 0
        # Reverse integration direction of proposal to form an involution
        # (mici/transitions.py:298-299).
        state_p = unpack(flat_p, -dir0)
        h_final = self.system.h(state_p)
        h_diff = h_init - h_final
        accept_prob = jnp.where(
            jnp.isnan(h_diff), 0.0, jnp.exp(jnp.minimum(0.0, h_diff)),
        )
        accept_prob = jnp.where(integration_error, 0.0, accept_prob)
        accepted = (
            jax.random.uniform(rng, dtype=h_init.dtype) < accept_prob
        ) & ~integration_error
        # Accepted proposal keeps its (already reversed) direction; the
        # trailing direction reversal of mici :311-314 then restores dir0
        # on acceptance and flips it on rejection.
        new_state = unpack(
            jnp.where(accepted, flat_p, flat0),
            jnp.where(accepted, dir0, -dir0),
        )
        stats = {
            "n_step": jnp.where(integration_error, n_done - 1, n_done),
            "accept_stat": accept_prob,
            "metrop_accept_prob": accept_prob,
            "non_reversible_step": flags["non_reversible_step"],
            "convergence_error": flags["convergence_error"],
            "step_size": jnp.abs(
                jnp.asarray(self.integrator.step_size, dtype=h_init.dtype),
            ),
        }
        return new_state, stats


@register_pytree(data_fields=("system", "integrator"),
                 static_fields=("n_step",))
class MetropolisStaticIntegrationTransition(MetropolisIntegrationTransition):
    """Static (fixed step count) Metropolis HMC transition.

    Reference: mici/transitions.py:318-352 (Duane et al. 1987).
    """

    def __init__(self, system, integrator, n_step):
        if n_step <= 0:
            msg = "Number of integrator steps must be positive."
            raise ValueError(msg)
        super().__init__(system, integrator)
        self.n_step = n_step

    def sample(self, state, rng):
        return self._sample_n_step(state, self.n_step, rng)


@register_pytree(data_fields=("system", "integrator"),
                 static_fields=("n_step_range",))
class MetropolisRandomIntegrationTransition(MetropolisIntegrationTransition):
    """Random step count Metropolis HMC transition.

    Reference: mici/transitions.py:355-402 (Neal 2011; Mackenzie 1989).
    """

    def __init__(self, system, integrator, n_step_range):
        n_step_lower, n_step_upper = n_step_range
        if not (n_step_lower > 0 and n_step_lower < n_step_upper):
            msg = ("Range bounds must be non-negative and first entry less "
                   "than last.")
            raise ValueError(msg)
        super().__init__(system, integrator)
        self.n_step_range = tuple(n_step_range)

    def sample(self, state, rng):
        key_n, key_acc = jax.random.split(rng)
        n_step = jax.random.randint(
            key_n, (), self.n_step_range[0], self.n_step_range[1],
        )
        return self._sample_n_step(state, n_step, key_acc)


# ---------------------------------------------------------------------------
# Dynamic (NUTS) transitions
# ---------------------------------------------------------------------------


class DynamicIntegrationTransition(IntegrationTransition):
    """Base class for dynamic integration transitions (NUTS-style).

    Reference: mici/transitions.py:487-770; see the module docstring for the
    recursive-to-iterative re-derivation.
    """

    def __init__(self, system, integrator, *, max_tree_depth=10,
                 max_delta_h=1000.0,
                 termination_criterion=riemannian_no_u_turn_criterion,
                 do_extra_subtree_checks=True, loop_mode="fused",
                 rebatch_depth=None, rebatch_slots=None,
                 rebatch_groups=None):
        if max_tree_depth <= 0:
            msg = "max_tree_depth must be non-negative."
            raise ValueError(msg)
        if loop_mode not in ("doubling", "fused"):
            msg = "loop_mode must be 'doubling' or 'fused'."
            raise ValueError(msg)
        if rebatch_depth is not None:
            if loop_mode != "fused":
                msg = ("depth-tail re-batching (rebatch_depth) requires "
                       "loop_mode='fused'.")
                raise ValueError(msg)
            if not 0 <= rebatch_depth:
                msg = "rebatch_depth must be non-negative."
                raise ValueError(msg)
        if rebatch_slots is not None and rebatch_slots <= 0:
            msg = "rebatch_slots must be positive."
            raise ValueError(msg)
        if rebatch_groups is not None and rebatch_groups <= 0:
            msg = "rebatch_groups must be positive."
            raise ValueError(msg)
        super().__init__(system, integrator)
        self.max_tree_depth = max_tree_depth
        self.max_delta_h = max_delta_h
        self.termination_criterion = termination_criterion
        self.do_extra_subtree_checks = do_extra_subtree_checks
        self.loop_mode = loop_mode
        self.rebatch_depth = rebatch_depth
        self.rebatch_slots = rebatch_slots
        self.rebatch_groups = rebatch_groups

    @property
    def statistic_types(self):
        types = super().statistic_types
        types["av_metrop_accept_prob"] = (float, jnp.nan)
        types["reject_prob"] = (float, jnp.nan)
        types["tree_depth"] = (jnp.int32, -1)
        types["diverging"] = (bool, False)
        return types

    # -- weight algebra (subclass hooks) -----------------------------------

    @abc.abstractmethod
    def _weight_at_leaf(self, h, aux_vars):
        """Weight of a single leaf (log-space for multinomial)."""

    @abc.abstractmethod
    def _zero_weight(self, dtype):
        """Additive identity for weights."""

    @abc.abstractmethod
    def _combine_weights(self, w1, w2):
        pass

    @abc.abstractmethod
    def _weight_ratio(self, numerator, denominator):
        pass

    @abc.abstractmethod
    def _is_divergent(self, h, aux_vars):
        pass

    # -- termination criterion wrappers ------------------------------------

    def _point(self, state):
        """Packed ``(3 * dim,)`` point array ``[pos | mom | dh_dmom]``."""
        return jnp.concatenate(
            [state.pos, state.mom, self.system.dh_dmom(state)], axis=-1,
        )

    def _crit(self, dir, first_arr, last_arr, sum_mom):
        """Oriented termination criterion on packed point arrays.

        ``first_arr``/``last_arr`` are in *build* order; under backwards
        integration the build order is the reverse of the time order the
        criterion expects, so the arguments are swapped.
        """
        first_point = _TreePoint(first_arr)
        last_point = _TreePoint(last_arr)
        fwd = self.termination_criterion(
            _VELOCITY_PROXY, first_point, last_point, sum_mom,
        )
        bwd = self.termination_criterion(
            _VELOCITY_PROXY, last_point, first_point, sum_mom,
        )
        return jnp.where(dir == 1, fwd, bwd)

    def _completed_subtree_uturns(self, dir, i, t, valid, point, cum_after,
                                  start_buf, end_buf):
        """U-turn checks for every aligned subtree completed by leaf ``i``.

        Leaf ``i`` completes aligned subtrees of scales ``l = 1..t``
        (``t`` = trailing ones of ``i``); for each, the whole-subtree
        no-U-turn check plus the two extra overlapping-subtree checks of
        mici/transitions.py:561-590 are evaluated from the checkpoint
        buffers.  The per-scale loop is unrolled with *scalar* dot
        products: under the chain ``vmap`` these are small fused
        elementwise+reduce chains, which measure ~5x faster than one
        batched-over-scales criterion call whose concatenated operands
        must be materialized per leaf.

        ``start_buf`` rows are ``[pos | mom | vel | mom-prefix-sum]``
        (lane-packed, ``4 * dim`` wide) per depth slot; ``end_buf`` rows
        are packed points of completed left-half subtree ends.
        """
        max_depth = self.max_tree_depth
        d3 = end_buf.shape[-1]              # 3 * dim
        uturn = jnp.bool_(False)
        for scale in range(1, max_depth + 1):
            active = (scale <= t) & valid
            a = i - (1 << scale) + 1
            z_a = jnp.where(
                a == 0, jnp.int32(max_depth),
                _trailing_zeros(jnp.maximum(a, 1)),
            )
            z_a = jnp.minimum(z_a, max_depth)
            start_entry = lax.dynamic_index_in_dim(
                start_buf, z_a, keepdims=False,
            )
            start_pt = start_entry[:d3]
            prefix_a = start_entry[d3:]
            seg_sum = cum_after - prefix_a
            check = self._crit(dir, start_pt, point, seg_sum)
            if self.do_extra_subtree_checks and scale >= 2:
                # Scale-l subtree halves live in slot l-1: static slices.
                mid_entry = start_buf[scale - 1]
                mid_pt = mid_entry[:d3]
                prefix_mid = mid_entry[d3:]
                end_left_pt = end_buf[scale - 1]
                sum_x1 = (prefix_mid - prefix_a) + _TreePoint(mid_pt).mom
                sum_x2 = ((cum_after - prefix_mid)
                          + _TreePoint(end_left_pt).mom)
                x1 = self._crit(dir, start_pt, mid_pt, sum_x1)
                x2 = self._crit(dir, end_left_pt, point, sum_x2)
                check = check | x1 | x2
            uturn = uturn | (active & check)
        return uturn

    def _merged_tree_uturn(self, direction, extra_active, neg_pt, pos_pt,
                           new_sum_mom, old_points, sub_points,
                           old_sum_mom, sub_cum_mom):
        """Whole-tree + overlapping-subtree checks after a doubling merge.

        Reference: mici/transitions.py:561-590, :754-756.  Scalar
        criterion calls on packed point arrays (fused cheaply under the
        chain vmap).
        """
        whole = self.termination_criterion(
            _VELOCITY_PROXY, _TreePoint(neg_pt), _TreePoint(pos_pt),
            new_sum_mom,
        )
        if not self.do_extra_subtree_checks:
            return whole
        old_neg_pt, old_pos_pt = old_points
        sub_neg_pt, sub_pos_pt = sub_points
        # neg/pos subtree assignment by direction
        nst_neg, nst_pos, nst_sum = jax.tree_util.tree_map(
            lambda old, new: jnp.where(direction == 1, old, new),
            (old_neg_pt, old_pos_pt, old_sum_mom),
            (sub_neg_pt, sub_pos_pt, sub_cum_mom),
        )
        pst_neg, pst_pos, pst_sum = jax.tree_util.tree_map(
            lambda old, new: jnp.where(direction == 1, new, old),
            (old_neg_pt, old_pos_pt, old_sum_mom),
            (sub_neg_pt, sub_pos_pt, sub_cum_mom),
        )
        x1 = self.termination_criterion(
            _VELOCITY_PROXY, _TreePoint(nst_neg), _TreePoint(pst_neg),
            nst_sum + _TreePoint(pst_neg).mom,
        )
        x2 = self.termination_criterion(
            _VELOCITY_PROXY, _TreePoint(nst_pos), _TreePoint(pst_pos),
            pst_sum + _TreePoint(nst_pos).mom,
        )
        return whole | (extra_active & (x1 | x2))

    # -- subtree build ------------------------------------------------------

    def _build_subtree(self, edge_state, depth, aux_vars, rng):
        """Iteratively build a subtree of ``2**depth`` new leaves.

        Reproduces the per-internal-node termination checks of the
        reference recursion (mici/transitions.py:645-706) using checkpoint
        buffers; see module docstring.

        Returns a dict with the subtree edges (full states, build order),
        momentum sum, weight, sampled proposal, termination/error flags and
        accumulated statistics.
        """
        max_depth = self.max_tree_depth
        n_leaf = jnp.left_shift(jnp.int32(1), depth)
        h_init = aux_vars["h_init"]
        dtype = h_init.dtype
        dir = edge_state.dir

        state0 = edge_state.clear_error()
        zero_mom = jnp.zeros_like(state0.mom)
        state_dim = state0.mom.shape[-1]
        pack, unpack = self._state_packer(state0)
        flat0 = pack(state0)

        start_buf = jnp.zeros((max_depth + 1, 4 * state_dim), dtype)
        end_buf = jnp.zeros((max_depth + 1, 3 * state_dim), dtype)

        carry = {
            "i": jnp.int32(0),
            "state": flat0,
            "first_leaf": flat0,    # placeholder, set at i == 0
            "proposal": flat0,
            "weight": self._zero_weight(dtype),
            "cum_mom": zero_mom,
            "start_buf": start_buf,
            "end_buf": end_buf,
            "uturn": jnp.bool_(False),
            "error_bits": jnp.int32(0),
            "diverging": jnp.bool_(False),
            "n_step": jnp.int32(0),
            "sum_accept_prob": jnp.zeros((), dtype),
            "rng": rng,
        }

        def cond(c):
            return (c["i"] < n_leaf) & ~c["uturn"] & (c["error_bits"] == 0) \
                & ~c["diverging"]

        def body(c):
            i = c["i"]
            key, key_prop = jax.random.split(c["rng"])
            stepped = self.integrator.step(unpack(c["state"], dir))
            error_bits = stepped.error
            int_error = error_bits != 0
            leaf = stepped.clear_error()
            h = self.system.h(leaf)
            h = jnp.where(jnp.isnan(h), jnp.inf, h)
            diverging = self._is_divergent(h, aux_vars) & ~int_error
            ok = ~int_error  # leaf counts toward stats unless step failed

            h_diff = h_init - h
            accept_prob = jnp.where(
                jnp.isnan(h_diff), 0.0, jnp.exp(jnp.minimum(0.0, h_diff)),
            )
            n_step = c["n_step"] + jnp.where(ok, 1, 0)
            sum_accept_prob = c["sum_accept_prob"] + jnp.where(
                ok, accept_prob, 0.0,
            )

            # A leaf on a divergent/failed step terminates the build; its
            # state never enters the tree (mici/transitions.py:670-672).
            valid = ok & ~diverging

            leaf_w = self._weight_at_leaf(h, aux_vars)
            new_weight = self._combine_weights(c["weight"], leaf_w)
            accept_leaf = (
                jax.random.uniform(key_prop, dtype=dtype)
                < self._weight_ratio(leaf_w, new_weight)
            ) | (i == 0)
            flat_leaf = pack(leaf)
            proposal = jnp.where(
                valid & accept_leaf, flat_leaf, c["proposal"],
            )
            weight = jnp.where(valid, new_weight, c["weight"])

            point = self._point(leaf)
            prefix_before = c["cum_mom"]
            cum_mom = jnp.where(valid, c["cum_mom"] + leaf.mom, c["cum_mom"])

            first_leaf = jnp.where(i == 0, flat_leaf, c["first_leaf"])

            # --- checkpoint stores -----------------------------------------
            z = jnp.where(
                i == 0, jnp.int32(max_depth), _trailing_zeros(
                    jnp.maximum(i, 1),
                ),
            )
            z = jnp.minimum(z, max_depth)
            start_buf = c["start_buf"].at[z].set(
                jnp.concatenate([point, prefix_before], axis=-1),
            )
            t = jnp.minimum(_trailing_zeros(i + 1), max_depth)
            end_buf = c["end_buf"].at[t].set(point)

            # --- per-merge termination checks ------------------------------
            uturn = self._completed_subtree_uturns(
                dir, i, t, valid, point, cum_mom, start_buf, end_buf,
            )

            return {
                "i": i + 1,
                "state": flat_leaf,
                "first_leaf": first_leaf,
                "proposal": proposal,
                "weight": weight,
                "cum_mom": cum_mom,
                "start_buf": start_buf,
                "end_buf": end_buf,
                "uturn": uturn,
                "error_bits": error_bits,
                "diverging": c["diverging"] | diverging,
                "n_step": n_step,
                "sum_accept_prob": sum_accept_prob,
                "rng": key,
            }

        out = lax.while_loop(cond, body, carry)
        terminated = out["uturn"] | (out["error_bits"] != 0) \
            | out["diverging"]
        return {
            "first_leaf": unpack(out["first_leaf"], dir),
            "last_leaf": unpack(out["state"], dir),
            "sum_mom": out["cum_mom"],
            "weight": out["weight"],
            "proposal": unpack(out["proposal"], dir),
            "terminated": terminated,
            "error_bits": out["error_bits"],
            "diverging": out["diverging"],
            "n_step": out["n_step"],
            "sum_accept_prob": out["sum_accept_prob"],
        }

    # -- auxiliary variables ------------------------------------------------

    def _init_aux_vars(self, state, h_init, rng):
        return {"h_init": h_init}

    # -- loop-mode dispatch ---------------------------------------------------

    def sample(self, state, rng):
        """Sample a NUTS transition.

        Two equivalent compiled formulations are available (constructor
        ``loop_mode``); they make identical decisions on identical PRNG
        streams and differ only in program structure:

        - ``"fused"`` (default): a single ``while`` loop over leaves with
          a masked merge phase.  One less loop-nesting level compiles
          5-30x faster (measured 3.4s vs 101s cold for dim-32 Euclidean
          NUTS at 1024 chains; 19.7s vs 148s for dim-2 SoftAbs RMHMC) at
          equal steady-state throughput for dim >= ~16 and <= 4% slower
          on very low-dimensional targets.
        - ``"doubling"``: nested ``while`` loops (doubling loop over
          subtree builds).  Slightly fastest steady-state on very
          low-dimensional targets where per-leaf loop overhead is
          comparable to the integrator step (measured ~4% faster at
          dim 2, 1024 chains); used by the headline benchmark.
        """
        if self.loop_mode == "fused":
            return self._sample_fused(state, rng)
        return self._sample_two_loop(state, rng)

    # -- fused single-loop NUTS ----------------------------------------------

    def _fused_machinery(self, example_state, *, with_step_size=False):
        """Factor the fused NUTS loop into ``(init, cond, body, finalize)``.

        The fused single-while-loop formulation (see :meth:`_sample_fused`)
        expressed as pure functions of an explicit per-chain carry, so
        batch-level execution strategies (:meth:`sample_batch` depth-tail
        re-batching) can drive the same loop over gathered chain subsets:
        every per-chain quantity — including the transition auxiliary
        variables (``h_init``, slice variable) and, when ``with_step_size``,
        a per-chain step-size override — lives in the carry; the returned
        closures capture only static structure (state packer, system,
        configuration) shared by all chains.

        Args:
            example_state: A (prepared) chain state providing the pytree
                structure/shapes; all its data leaves are replaced on
                unpacking, so a traced representative (e.g. chain 0 of a
                batch) is safe.
            with_step_size: Thread a per-chain integrator step size
                through the carry (``init(state, rng, step_size)``).

        Returns:
            ``(init, cond, body, finalize)`` where ``init(state, rng[,
            step_size]) -> carry``, ``cond``/``body`` are ``while_loop``
            pieces over the carry and ``finalize(carry) -> (state, stats)``.
        """
        system = self.system
        max_depth = self.max_tree_depth
        template = example_state.clear_error()
        dtype = template.pos.dtype
        state_dim = template.mom.shape[-1]
        pack, unpack = self._state_packer(template)

        def init(state, rng, step_size=None):
            state = state.clear_error()
            h_init = system.h(state)
            h_init = jnp.where(jnp.isnan(h_init), jnp.inf, h_init)
            key_aux, key_loop = jax.random.split(rng)
            aux_vars = self._init_aux_vars(state, h_init, key_aux)
            init_weight = self._weight_at_leaf(h_init, aux_vars)

            point0 = self._point(state)
            zero_mom = jnp.zeros_like(state.mom)
            flat0 = pack(state)

            carry = {
                # loop position
                "depth": jnp.int32(0),
                "i": jnp.int32(0),
                "terminated": jnp.bool_(False),
                "rng": key_loop,
                # per-chain auxiliary variables (h_init, slice variable)
                "aux": aux_vars,
                # tree level (tree states are flat-packed vectors; see
                # _state_packer)
                "neg_state": flat0,
                "pos_state": flat0,
                # cached points (pos/mom/velocity) of the tree edges: the
                # merge phase runs masked on every leaf, so its termination
                # checks must not recompute dh_dmom (a full metric rebuild
                # for Riemannian systems) — they read these carried points
                # instead.
                "neg_point": point0,
                "pos_point": point0,
                "sum_mom": jnp.asarray(state.mom),
                "weight": init_weight,
                "next_state": flat0,
                "next_state_dir": state.dir,
                "n_step": jnp.int32(0),
                "sum_accept_prob": jnp.zeros((), dtype),
                "reject_prob": jnp.ones((), dtype),
                "diverging": jnp.bool_(False),
                "non_reversible_step": jnp.bool_(False),
                "convergence_error": jnp.bool_(False),
                "tree_depth": jnp.int32(0),
                # subtree level
                "direction": jnp.int32(1),
                "key_acc": key_loop,  # placeholder, set at subtree start
                "sub_rng": key_loop,
                "state": flat0,
                "first_leaf": flat0,
                "first_leaf_point": point0,
                "sub_proposal": flat0,
                "sub_weight": self._zero_weight(dtype),
                "sub_cum_mom": zero_mom,
                "start_buf": jnp.zeros(
                    (max_depth + 1, 4 * state_dim), dtype,
                ),
                "end_buf": jnp.zeros(
                    (max_depth + 1, 3 * state_dim), dtype,
                ),
            }
            if with_step_size:
                carry["step_size"] = step_size
            return carry

        def cond(c):
            return (c["depth"] < max_depth) & ~c["terminated"]

        def body(c):
            aux_vars = c["aux"]
            h_init = aux_vars["h_init"]
            integrator = self.integrator
            if with_step_size:
                integrator = integrator.replace(step_size=c["step_size"])
            zero_mom = jnp.zeros_like(c["sum_mom"])
            i = c["i"]
            depth = c["depth"]
            at_start = i == 0

            # --- phase 1 (masked): start a new subtree -----------------
            # Same 4-way split as the two-loop doubling body; outputs are
            # only *adopted* when at_start, so the key sequence matches.
            key_next, key_dir, key_acc_new, key_build = jax.random.split(
                c["rng"], 4,
            )
            direction = jnp.where(
                at_start,
                jnp.where(
                    jax.random.uniform(key_dir, dtype=dtype) < 0.5,
                    jnp.int32(1), jnp.int32(-1),
                ),
                c["direction"],
            )
            rng = jnp.where(at_start, key_next, c["rng"])
            key_acc = jnp.where(at_start, key_acc_new, c["key_acc"])
            sub_rng = jnp.where(at_start, key_build, c["sub_rng"])
            edge = jnp.where(
                direction == 1, c["pos_state"], c["neg_state"],
            )
            state_in = unpack(
                jnp.where(at_start, edge, c["state"]), direction,
            )
            sub_weight = jnp.where(
                at_start, self._zero_weight(dtype), c["sub_weight"],
            )
            sub_cum_mom = jnp.where(at_start, zero_mom, c["sub_cum_mom"])

            # --- phase 2: one leaf step (as in _build_subtree) ----------
            sub_rng, key_prop = jax.random.split(sub_rng)
            stepped = integrator.step(state_in)
            error_bits = stepped.error
            int_error = error_bits != 0
            leaf = stepped.clear_error()
            h = system.h(leaf)
            h = jnp.where(jnp.isnan(h), jnp.inf, h)
            leaf_diverging = self._is_divergent(h, aux_vars) & ~int_error
            ok = ~int_error

            h_diff = h_init - h
            accept_prob = jnp.where(
                jnp.isnan(h_diff), 0.0, jnp.exp(jnp.minimum(0.0, h_diff)),
            )
            n_step = c["n_step"] + jnp.where(ok, 1, 0)
            sum_accept_prob = c["sum_accept_prob"] + jnp.where(
                ok, accept_prob, 0.0,
            )

            valid = ok & ~leaf_diverging

            leaf_w = self._weight_at_leaf(h, aux_vars)
            new_sub_weight = self._combine_weights(sub_weight, leaf_w)
            accept_leaf = (
                jax.random.uniform(key_prop, dtype=dtype)
                < self._weight_ratio(leaf_w, new_sub_weight)
            ) | at_start
            flat_leaf = pack(leaf)
            sub_proposal = jnp.where(
                valid & accept_leaf, flat_leaf, c["sub_proposal"],
            )
            sub_weight = jnp.where(valid, new_sub_weight, sub_weight)

            point = self._point(leaf)
            prefix_before = sub_cum_mom
            sub_cum_mom = jnp.where(
                valid, sub_cum_mom + leaf.mom, sub_cum_mom,
            )
            first_leaf = jnp.where(at_start, flat_leaf, c["first_leaf"])
            first_leaf_point = jnp.where(
                at_start, point, c["first_leaf_point"],
            )

            # checkpoint stores (see _build_subtree)
            z = jnp.where(
                at_start, jnp.int32(max_depth),
                _trailing_zeros(jnp.maximum(i, 1)),
            )
            z = jnp.minimum(z, max_depth)
            start_buf = c["start_buf"].at[z].set(
                jnp.concatenate([point, prefix_before], axis=-1),
            )
            t = jnp.minimum(_trailing_zeros(i + 1), max_depth)
            end_buf = c["end_buf"].at[t].set(point)

            # per-merge termination checks over completed aligned subtrees
            sub_uturn = self._completed_subtree_uturns(
                direction, i, t, valid, point, sub_cum_mom, start_buf,
                end_buf,
            )

            flags = _error_flags(error_bits)
            diverging = c["diverging"] | leaf_diverging
            non_reversible = (c["non_reversible_step"]
                              | flags["non_reversible_step"])
            convergence_error = (c["convergence_error"]
                                 | flags["convergence_error"])
            sub_terminated = sub_uturn | int_error | leaf_diverging

            # --- phase 3 (masked): merge a completed subtree -------------
            n_leaf = jnp.left_shift(jnp.int32(1), depth)
            complete = i + 1 == n_leaf
            built_ok = complete & ~sub_terminated

            accept_proposal_prob = self._weight_ratio(
                sub_weight, c["weight"],
            )
            accept = built_ok & (
                jax.random.uniform(key_acc, dtype=dtype)
                < accept_proposal_prob
            )
            next_state = jnp.where(accept, sub_proposal, c["next_state"])
            next_state_dir = jnp.where(
                accept, direction, c["next_state_dir"],
            )
            reject_prob = jnp.where(
                built_ok,
                c["reject_prob"] * (1.0 - accept_proposal_prob),
                c["reject_prob"],
            )

            sub_neg = jnp.where(direction == 1, first_leaf, flat_leaf)
            sub_pos = jnp.where(direction == 1, flat_leaf, first_leaf)
            new_neg = jnp.where(direction == 1, c["neg_state"], sub_neg)
            new_pos = jnp.where(direction == 1, sub_pos, c["pos_state"])
            new_sum_mom = c["sum_mom"] + sub_cum_mom
            new_weight = self._combine_weights(c["weight"], sub_weight)

            # All merge-check points come from carried caches (velocity
            # included) — no dh_dmom recomputation in the masked merge.
            sub_neg_pt = jnp.where(
                direction == 1, first_leaf_point, point,
            )
            sub_pos_pt = jnp.where(
                direction == 1, point, first_leaf_point,
            )
            neg_pt = jnp.where(
                direction == 1, c["neg_point"], sub_neg_pt,
            )
            pos_pt = jnp.where(
                direction == 1, sub_pos_pt, c["pos_point"],
            )
            whole = self._merged_tree_uturn(
                direction, depth >= 1, neg_pt, pos_pt, new_sum_mom,
                (c["neg_point"], c["pos_point"]),
                (sub_neg_pt, sub_pos_pt),
                c["sum_mom"], sub_cum_mom,
            )
            merged_terminate = built_ok & whole

            new_c = {
                "depth": jnp.where(complete, depth + 1, depth),
                "i": jnp.where(complete, jnp.int32(0), i + 1),
                "terminated": sub_terminated | merged_terminate,
                "rng": rng,
                "aux": aux_vars,
                "neg_state": jnp.where(built_ok, new_neg, c["neg_state"]),
                "pos_state": jnp.where(built_ok, new_pos, c["pos_state"]),
                "neg_point": jnp.where(built_ok, neg_pt, c["neg_point"]),
                "pos_point": jnp.where(built_ok, pos_pt, c["pos_point"]),
                "sum_mom": jnp.where(built_ok, new_sum_mom, c["sum_mom"]),
                "weight": jnp.where(built_ok, new_weight, c["weight"]),
                "next_state": next_state,
                "next_state_dir": next_state_dir,
                "n_step": n_step,
                "sum_accept_prob": sum_accept_prob,
                "reject_prob": reject_prob,
                "diverging": diverging,
                "non_reversible_step": non_reversible,
                "convergence_error": convergence_error,
                "tree_depth": depth,
                "direction": direction,
                "key_acc": key_acc,
                "sub_rng": sub_rng,
                "state": flat_leaf,
                "first_leaf": first_leaf,
                "first_leaf_point": first_leaf_point,
                "sub_proposal": sub_proposal,
                "sub_weight": sub_weight,
                "sub_cum_mom": sub_cum_mom,
                "start_buf": start_buf,
                "end_buf": end_buf,
            }
            if with_step_size:
                new_c["step_size"] = c["step_size"]
            return new_c

        def finalize(out):
            n_step = out["n_step"]
            av_accept = jnp.where(
                n_step > 0,
                out["sum_accept_prob"] / jnp.maximum(n_step, 1), 0.0,
            )
            any_error = (out["diverging"] | out["non_reversible_step"]
                         | out["convergence_error"])
            accept_stat = jnp.where(any_error, 0.0, av_accept)
            step_size = (out["step_size"] if with_step_size
                         else self.integrator.step_size)
            stats = {
                "n_step": n_step,
                "accept_stat": accept_stat,
                "av_metrop_accept_prob": av_accept,
                "reject_prob": out["reject_prob"],
                "tree_depth": out["tree_depth"],
                "diverging": out["diverging"],
                "non_reversible_step": out["non_reversible_step"],
                "convergence_error": out["convergence_error"],
                "step_size": jnp.abs(jnp.asarray(step_size, dtype=dtype)),
            }
            return unpack(out["next_state"], out["next_state_dir"]), stats

        return init, cond, body, finalize

    def _sample_fused(self, state, rng):
        """Sample a NUTS transition with a single fused ``while_loop``.

        Fuses the doubling loop and the per-leaf subtree loop into one
        ``lax.while_loop`` over leaves: the merge phase (progressive
        proposal swap, edge merging, merged-tree termination checks of
        mici/transitions.py:708-770) executes masked in the same body on
        the iteration where ``i + 1 == 2**depth``.  One less ``while``
        nesting level makes XLA/Mosaic compiles of implicit-integrator
        NUTS programs substantially faster; the per-leaf checkpoint-buffer
        bookkeeping of :meth:`_build_subtree` carries over unchanged (the
        buffers never need resetting between subtrees because every read
        slot is written earlier in the same subtree).

        PRNG streams are consumed in exactly the same order as the
        two-loop formulation (:meth:`_sample_two_loop`), so the two are
        trajectory-for-trajectory bit-identical (tested in
        ``tests/test_nuts_equivalence.py``).
        """
        init, cond, body, finalize = self._fused_machinery(state)
        return finalize(lax.while_loop(cond, body, init(state, rng)))

    # -- batch-level sampling: depth-tail re-batching -------------------------

    def sample_batch(self, states, rngs, params=None):
        """Sample a chain batch, re-batching the deep-tree tail.

        Vmapped NUTS executes the *batch-max* tree depth in lockstep every
        iteration — the execution-model gap vs the reference's per-chain
        doubling loop (mici/transitions.py:708-770), which pays only each
        chain's actual depth.  With ``rebatch_depth`` set (and the default
        ``loop_mode="fused"``), this override removes most of that tail
        cost without changing a single sampled trajectory:

        1. *Bulk phase*: all chains run the fused leaf loop in lockstep
           until each has either finished its transition or reached tree
           depth ``rebatch_depth``.
        2. *Tail phase*: the (typically few) chains still mid-trajectory
           are argsort-gathered into a fixed-size slot batch of
           ``rebatch_slots`` lanes and continued to ``max_tree_depth``,
           scattering their carries back on completion; a bounded
           ``while_loop`` over rounds handles tails larger than the slot
           count.

        Because both phases apply exactly the per-chain loop body of
        :meth:`_sample_fused` (masked where inactive), the per-chain
        decisions, trajectories and statistics are bit-identical to plain
        ``vmap(sample)`` — tested in ``tests/test_nuts_equivalence.py``.
        With ``rebatch_depth=None`` (default) this falls back to the
        plain vmap of :meth:`Transition.sample_batch`.
        """
        if self.rebatch_depth is None or self.loop_mode != "fused":
            return super().sample_batch(states, rngs, params)
        params = {} if params is None else params
        step_size = params.get("step_size")
        with_step = step_size is not None
        example = jax.tree_util.tree_map(lambda x: x[0], states)
        init, cond, body, finalize = self._fused_machinery(
            example, with_step_size=with_step,
        )
        n_chain = rngs.shape[0]
        bulk_depth = min(self.rebatch_depth, self.max_tree_depth)
        slots = self.rebatch_slots
        if slots is None:
            slots = max(8, n_chain // 8)
        slots = min(slots, n_chain)

        if with_step:
            carry = jax.vmap(init)(states, rngs, step_size)
        else:
            carry = jax.vmap(init)(states, rngs)

        vcond = jax.vmap(cond)
        vbody = jax.vmap(body)

        def masked_step(c, active):
            return _select_batched(active, vbody(c), c)

        # Phase 1: all chains in lockstep to the bulk depth limit.
        def bulk_active(c):
            return vcond(c) & (c["depth"] < bulk_depth)

        carry = lax.while_loop(
            lambda c: jnp.any(bulk_active(c)),
            lambda c: masked_step(c, bulk_active(c)),
            carry,
        )

        # Phase 2: fixed-slot rounds over the unfinished tail.  Each round
        # gathers up to ``slots`` active chains (argsort is stable, actives
        # first), runs them to completion masked in lockstep, and scatters
        # the carries back; padding lanes holding finished chains pass
        # through unchanged.
        #
        # When the chain axis is sharded over a device mesh, a gather
        # indexed across the *whole* axis would lower to cross-device
        # all-to-all traffic every round.  ``rebatch_groups`` (set by the
        # sampler to the number of chain shards when a mesh is passed)
        # splits the axis into that many contiguous groups and gathers the
        # tail *within each group*: the reshape (n_chain,) ->
        # (groups, n_chain/groups) splits the sharded axis so group 0 of
        # the gather batch lives wholly on device 0, etc., and the SPMD
        # partitioner keeps every gather/scatter shard-local (verified at
        # the HLO level in tests/test_parallel.py).  Per-chain decisions
        # are bit-identical for any grouping — the loop body is the same
        # per-chain function whichever slot lane a chain occupies.
        groups = self.rebatch_groups or 1
        if groups <= 1 or n_chain % groups != 0:
            groups = 1
        per_group = n_chain // groups
        slots_g = -(-slots // groups)  # ceil: total slot budget preserved
        slots_g = min(slots_g, per_group)

        def continue_slot(c):
            return lax.while_loop(
                lambda s: jnp.any(vcond(s)),
                lambda s: masked_step(s, vcond(s)),
                c,
            )

        def rounds_body(state):
            c, active = state
            active_g = active.reshape(groups, per_group)
            idx = jax.vmap(
                lambda a: jnp.argsort(~a)[:slots_g],
            )(active_g)  # (groups, slots_g), actives first per group

            def gather(x):
                xg = x.reshape((groups, per_group) + x.shape[1:])
                sg = jax.vmap(lambda xe, ie: xe[ie])(xg, idx)
                return sg.reshape((groups * slots_g,) + x.shape[1:])

            slot = jax.tree_util.tree_map(gather, c)
            slot = continue_slot(slot)

            def scatter(x, y):
                xg = x.reshape((groups, per_group) + x.shape[1:])
                yg = y.reshape((groups, slots_g) + y.shape[1:])
                out = jax.vmap(
                    lambda xe, ie, ye: xe.at[ie].set(ye),
                )(xg, idx, yg)
                return out.reshape(x.shape)

            c = jax.tree_util.tree_map(scatter, c, slot)
            new_active = jax.vmap(
                lambda ae, ie: ae.at[ie].set(False),
            )(active_g, idx)
            return c, new_active.reshape(active.shape)

        carry, _ = lax.while_loop(
            lambda state: jnp.any(state[1]),
            rounds_body,
            (carry, vcond(carry)),
        )
        return jax.vmap(finalize)(carry)

    # -- two-loop reference formulation (kept for A/B testing) ---------------

    def _sample_two_loop(self, state, rng):
        """Two-level (doubling + leaf) formulation; equivalent to
        :meth:`sample` and retained as its differential-testing oracle."""
        state = state.clear_error()
        system = self.system
        dtype = state.pos.dtype
        h_init = system.h(state)
        h_init = jnp.where(jnp.isnan(h_init), jnp.inf, h_init)
        key_aux, key_loop = jax.random.split(rng)
        aux_vars = self._init_aux_vars(state, h_init, key_aux)

        init_weight = self._weight_at_leaf(h_init, aux_vars)

        carry = {
            "depth": jnp.int32(0),
            "terminated": jnp.bool_(False),
            "neg_state": state,
            "pos_state": state,
            "sum_mom": jnp.asarray(state.mom),
            "weight": init_weight,
            "next_state": state,
            "n_step": jnp.int32(0),
            "sum_accept_prob": jnp.zeros((), dtype),
            "reject_prob": jnp.ones((), dtype),
            "diverging": jnp.bool_(False),
            "non_reversible_step": jnp.bool_(False),
            "convergence_error": jnp.bool_(False),
            "tree_depth": jnp.int32(0),
            "rng": key_loop,
        }

        def cond(c):
            return (c["depth"] < self.max_tree_depth) & ~c["terminated"]

        def body(c):
            # Four-way split: the subtree build gets its own key so its
            # internal per-leaf stream cannot collide with later loop keys
            # (jax.random.split(k, m) outputs are prefixes of
            # jax.random.split(k, n > m) outputs).
            key, key_dir, key_acc, key_build = jax.random.split(
                c["rng"], 4,
            )
            direction = jnp.where(
                jax.random.uniform(key_dir, dtype=dtype) < 0.5,
                jnp.int32(1), jnp.int32(-1),
            )
            edge = _where_tree(
                direction == 1, c["pos_state"], c["neg_state"],
            ).replace(dir=direction)
            sub = self._build_subtree(
                edge, c["depth"], aux_vars, key_build,
            )

            flags = _error_flags(sub["error_bits"])
            diverging = c["diverging"] | sub["diverging"]
            non_reversible = (c["non_reversible_step"]
                              | flags["non_reversible_step"])
            convergence_error = (c["convergence_error"]
                                 | flags["convergence_error"])

            built_ok = ~sub["terminated"]

            # Progressive proposal acceptance biased towards new subtree
            # (mici/transitions.py:740-749).
            accept_proposal_prob = self._weight_ratio(
                sub["weight"], c["weight"],
            )
            accept = built_ok & (
                jax.random.uniform(key_acc, dtype=dtype)
                < accept_proposal_prob
            )
            next_state = _where_tree(accept, sub["proposal"],
                                     c["next_state"])
            reject_prob = jnp.where(
                built_ok,
                c["reject_prob"] * (1.0 - accept_proposal_prob),
                c["reject_prob"],
            )

            # Merge new subtree into tree (mici/transitions.py:750-753).
            sub_neg = _where_tree(
                direction == 1, sub["first_leaf"], sub["last_leaf"],
            )
            sub_pos = _where_tree(
                direction == 1, sub["last_leaf"], sub["first_leaf"],
            )
            new_neg = _where_tree(direction == 1, c["neg_state"], sub_neg)
            new_pos = _where_tree(direction == 1, sub_pos, c["pos_state"])
            new_sum_mom = c["sum_mom"] + sub["sum_mom"]
            new_weight = self._combine_weights(c["weight"], sub["weight"])

            # Termination criterion on merged tree + overlapping subtrees
            # (mici/transitions.py:561-590, :754-756).
            neg_pt = self._point(new_neg)
            pos_pt = self._point(new_pos)
            old_neg_pt = self._point(c["neg_state"])
            old_pos_pt = self._point(c["pos_state"])
            sub_neg_pt = jnp.where(
                direction == 1, self._point(sub["first_leaf"]),
                self._point(sub["last_leaf"]),
            )
            sub_pos_pt = jnp.where(
                direction == 1, self._point(sub["last_leaf"]),
                self._point(sub["first_leaf"]),
            )
            whole = self._merged_tree_uturn(
                direction, c["depth"] >= 1, neg_pt, pos_pt, new_sum_mom,
                (old_neg_pt, old_pos_pt), (sub_neg_pt, sub_pos_pt),
                c["sum_mom"], sub["sum_mom"],
            )

            merged_terminate = built_ok & whole

            return {
                "depth": c["depth"] + 1,
                "terminated": sub["terminated"] | merged_terminate,
                "neg_state": _where_tree(built_ok, new_neg, c["neg_state"]),
                "pos_state": _where_tree(built_ok, new_pos, c["pos_state"]),
                "sum_mom": jnp.where(built_ok, new_sum_mom, c["sum_mom"]),
                "weight": jnp.where(built_ok, new_weight, c["weight"]),
                "next_state": next_state,
                "n_step": c["n_step"] + sub["n_step"],
                "sum_accept_prob":
                    c["sum_accept_prob"] + sub["sum_accept_prob"],
                "reject_prob": reject_prob,
                "diverging": diverging,
                "non_reversible_step": non_reversible,
                "convergence_error": convergence_error,
                "tree_depth": c["depth"],
                "rng": key,
            }

        out = lax.while_loop(cond, body, carry)

        n_step = out["n_step"]
        av_accept = jnp.where(
            n_step > 0, out["sum_accept_prob"] / jnp.maximum(n_step, 1), 0.0,
        )
        any_error = (out["diverging"] | out["non_reversible_step"]
                     | out["convergence_error"])
        accept_stat = jnp.where(any_error, 0.0, av_accept)
        stats = {
            "n_step": n_step,
            "accept_stat": accept_stat,
            "av_metrop_accept_prob": av_accept,
            "reject_prob": out["reject_prob"],
            "tree_depth": out["tree_depth"],
            "diverging": out["diverging"],
            "non_reversible_step": out["non_reversible_step"],
            "convergence_error": out["convergence_error"],
            "step_size": jnp.abs(jnp.asarray(
                self.integrator.step_size, dtype=dtype,
            )),
        }
        return out["next_state"], stats


@register_pytree(
    data_fields=("system", "integrator"),
    static_fields=("max_tree_depth", "max_delta_h", "termination_criterion",
                   "do_extra_subtree_checks", "loop_mode", "rebatch_depth",
                   "rebatch_slots", "rebatch_groups"),
)
class MultinomialDynamicIntegrationTransition(DynamicIntegrationTransition):
    """Dynamic integration transition with multinomial proposal sampling.

    Reference: mici/transitions.py:773-809 (Betancourt 2017).  Tree weights
    are carried in log space (``w = -h``), replacing ``LogRepFloat``.
    """

    def _weight_at_leaf(self, h, aux_vars):
        return -h

    def _zero_weight(self, dtype):
        return jnp.asarray(-jnp.inf, dtype)

    def _combine_weights(self, w1, w2):
        return jnp.logaddexp(w1, w2)

    def _weight_ratio(self, numerator, denominator):
        return jnp.exp(jnp.minimum(numerator - denominator, 0.0))

    def _is_divergent(self, h, aux_vars):
        return h - aux_vars["h_init"] > self.max_delta_h


@register_pytree(
    data_fields=("system", "integrator"),
    static_fields=("max_tree_depth", "max_delta_h", "termination_criterion",
                   "do_extra_subtree_checks", "loop_mode", "rebatch_depth",
                   "rebatch_slots", "rebatch_groups"),
)
class SliceDynamicIntegrationTransition(DynamicIntegrationTransition):
    """Dynamic integration transition with slice-sampled proposals.

    Reference: mici/transitions.py:812-858 (Hoffman & Gelman 2014, Alg. 3
    when used with the Euclidean no-U-turn criterion).
    """

    def _init_aux_vars(self, state, h_init, rng):
        log_u = jnp.log(
            jax.random.uniform(rng, dtype=h_init.dtype),
        ) - h_init
        return {"h_init": h_init, "log_u": log_u}

    def _weight_at_leaf(self, h, aux_vars):
        return (aux_vars["log_u"] <= -h).astype(h.dtype)

    def _zero_weight(self, dtype):
        return jnp.zeros((), dtype)

    def _combine_weights(self, w1, w2):
        return w1 + w2

    def _weight_ratio(self, numerator, denominator):
        safe_denominator = jnp.where(denominator > 0, denominator, 1.0)
        return jnp.where(
            denominator > 0,
            jnp.minimum(numerator / safe_denominator, 1.0),
            jnp.minimum(numerator, 1.0),
        )

    def _is_divergent(self, h, aux_vars):
        return h + aux_vars["log_u"] > self.max_delta_h
