"""Classes for staging sampling of Markov chains.

Reference: mici/stagers.py (280 LoC).  Stage scheduling is pure integer
logic and is reproduced with the reference's exact window arithmetic
(mici/stagers.py:196-280); each stage later becomes one compiled scan in
the sampler.
"""

from __future__ import annotations

import abc
from typing import NamedTuple


class ChainStage(NamedTuple):
    """Parameters of a chain sampling stage.

    Reference: mici/stagers.py:15-28.
    """

    n_iter: int
    adapters: dict | None
    trace_funcs: tuple | None
    record_stats: bool


class Stager(abc.ABC):
    """Abstract chain iteration stager. Reference: mici/stagers.py:31-83."""

    @abc.abstractmethod
    def stages(self, n_warm_up_iter, n_main_iter, adapters, trace_funcs, *,
               trace_warm_up=False):
        """Create ordered dict of stage label -> ChainStage."""


class WarmUpStager(Stager):
    """Single adaptive warm up stage then main stage.

    Reference: mici/stagers.py:86-126.
    """

    def stages(self, n_warm_up_iter, n_main_iter, adapters, trace_funcs, *,
               trace_warm_up=False):
        sampling_stages = {}
        trace_funcs = (tuple(trace_funcs) if trace_funcs is not None
                       else trace_funcs)
        if n_warm_up_iter > 0:
            warm_up_trace_funcs = trace_funcs if trace_warm_up else None
            sampling_stages["Adaptive warm up"] = ChainStage(
                n_iter=n_warm_up_iter, adapters=adapters,
                trace_funcs=warm_up_trace_funcs,
                record_stats=trace_warm_up,
            )
        if n_main_iter > 0:
            sampling_stages["Main non-adaptive"] = ChainStage(
                n_iter=n_main_iter, adapters=None, trace_funcs=trace_funcs,
                record_stats=True,
            )
        return sampling_stages


class WindowedWarmUpStager(Stager):
    """Hierarchy of adaptive warm up stages with Stan-style growing windows.

    Fast stages adapt only 'fast' adapters (``adapter.is_fast``); slow
    windows additionally run slow adapters, with windows growing by
    ``slow_window_multiplier`` and adapter state reset at each window
    boundary.  Reference: mici/stagers.py:129-280.
    """

    def __init__(self, n_init_slow_window_iter=25, n_init_fast_stage_iter=75,
                 n_final_fast_stage_iter=50, slow_window_multiplier=2.0):
        self.n_init_slow_window_iter = n_init_slow_window_iter
        self.n_init_fast_stage_iter = n_init_fast_stage_iter
        self.n_final_fast_stage_iter = n_final_fast_stage_iter
        self.slow_window_multiplier = slow_window_multiplier

    def stages(self, n_warm_up_iter, n_main_iter, adapters, trace_funcs, *,
               trace_warm_up=False):
        trace_funcs = (tuple(trace_funcs) if trace_funcs is not None
                       else trace_funcs)
        fast_adapters = {
            trans_key: [a for a in adapter_list if a.is_fast]
            for trans_key, adapter_list in adapters.items()
        }
        # Window size adjustment (mici/stagers.py:210-223).
        if (self.n_init_fast_stage_iter + self.n_init_slow_window_iter
                + self.n_final_fast_stage_iter) > n_warm_up_iter:
            n_init_fast_stage_iter = int(0.15 * n_warm_up_iter)
            n_final_fast_stage_iter = int(0.1 * n_warm_up_iter)
            n_init_slow_window_iter = (
                n_warm_up_iter - n_init_fast_stage_iter
                - n_final_fast_stage_iter
            )
        else:
            n_init_slow_window_iter = self.n_init_slow_window_iter
            n_init_fast_stage_iter = self.n_init_fast_stage_iter
            n_final_fast_stage_iter = self.n_final_fast_stage_iter
        sampling_stages = {}
        if n_warm_up_iter > 0:
            warm_up_trace_funcs = trace_funcs if trace_warm_up else None
            record_stats = trace_warm_up
            sampling_stages["Initial fast adaptive"] = ChainStage(
                n_iter=n_init_fast_stage_iter, adapters=fast_adapters,
                trace_funcs=warm_up_trace_funcs, record_stats=record_stats,
            )
            # Growing slow adaptation windows (mici/stagers.py:236-255).
            n_window_iter = n_init_slow_window_iter
            slow_windows = []
            counter = 0
            n_slow_stage_iter = (
                n_warm_up_iter - n_init_fast_stage_iter
                - n_final_fast_stage_iter
            )
            while counter < n_slow_stage_iter:
                counter_next = counter + int(
                    (1 + self.slow_window_multiplier) * n_window_iter,
                )
                if counter_next > n_slow_stage_iter:
                    n_window_iter = n_slow_stage_iter - counter
                slow_windows.append(n_window_iter)
                counter += n_window_iter
                n_window_iter = int(
                    self.slow_window_multiplier * n_window_iter,
                )
            for i, n_iter in enumerate(slow_windows):
                label = f"Slow adaptive ({i + 1}/{len(slow_windows)})"
                sampling_stages[label] = ChainStage(
                    n_iter=n_iter, adapters=adapters,
                    trace_funcs=warm_up_trace_funcs,
                    record_stats=record_stats,
                )
            sampling_stages["Final fast adaptive"] = ChainStage(
                n_iter=n_final_fast_stage_iter, adapters=fast_adapters,
                trace_funcs=warm_up_trace_funcs, record_stats=record_stats,
            )
        if n_main_iter > 0:
            sampling_stages["Main non-adaptive"] = ChainStage(
                n_iter=n_main_iter, adapters=None, trace_funcs=trace_funcs,
                record_stats=True,
            )
        return sampling_stages
