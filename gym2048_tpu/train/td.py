"""TD(0) afterstate learning with an n-tuple network (TPU-native).

The classical strongest 2048 learner (Szubert & Jaskowski 2014): learn a
value function V over *afterstates* (board after the slide/merge, before
the random spawn) by one-step temporal differences:

    a*   = argmax_a [ r(s, a) + V(after(s, a)) ]
    TD:    V(after(s, a*)) += alpha * (r' + V(after(s'', a*')) - V(after))

where s'' is the post-spawn next state and a*' its greedy move. The
reference framework has nothing comparable (its only learners are BC and
PPO on a CNN policy); this is a beyond-reference model family.

TPU realisation: thousands of games advance in lockstep inside one jitted
``lax.scan`` — greedy move selection via the branch-free ``rules.move_all``,
value lookups as batched gathers into the 5.7 MB table, the TD step as one
batched scatter-add, spawns and resets from on-device RNG. There is no
gradient tape: the "optimiser" IS the scatter-add.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gym2048_tpu.core import rules
from gym2048_tpu.models import ntuple


@dataclasses.dataclass(frozen=True)
class TDConfig:
    total_steps: int = 200_000_000  # env steps (board-moves) to train for
    n_envs: int = 4096
    alpha: float = 0.1          # value-space learning rate (see td_update)
    alpha_final: float = 0.02   # linear anneal target over total_steps
    init_value: float = 80_000.0  # optimistic init (encourages exploration)
    seed: int = 0
    chunk_steps: int = 256      # scan length per jitted chunk
    # table-update implementation: "scatter" (XLA scatter-add; for big
    # nets this is the CHANNEL-SPLIT form — docs/PERF.md round-4 study),
    # "mxu" (small net only: one-hot matmul scatter on the TPU MXU),
    # "rows" (big nets: 128-lane row scatter, measured neutral), or
    # "auto" (small net: mxu on TPU / scatter elsewhere; big nets:
    # scatter).
    update_impl: str = "auto"
    # value-lookup implementation: "gather" (XLA gather; fast on CPU),
    # "mxu" (split-bf16 one-hot matmuls, exact to ~2^-16 — XLA:TPU gather
    # sustains only ~135M idx/s and left the chunk gather-bound),
    # "mxu_bf16" (single-pass bf16 lookup: ~0.4% value noise, half the
    # value FLOPs, 966k vs 622k steps/s — but measured ~2k eval score
    # below exact-split TC training at 150M steps, docs/PERF.md),
    # "rows" (big nets: 128-lane row gather + one-hot lane select,
    # exact), or "auto" (small net: exact "mxu" on TPU / gather
    # elsewhere; big nets: rows on TPU / gather elsewhere).
    value_impl: str = "auto"
    # temporal-coherence learning (Beal & Smith): per-entry adaptive rates
    # |sum(deltas)| / sum(|deltas|) replace the global alpha anneal — set
    # alpha = alpha_final = 1.0 (the meta-rate) when enabling.
    tc: bool = False
    # network architecture: "small" is the VMEM-sized 17x4-cell net of
    # models/ntuple.py (MXU dense scatter/gather); any other name is an
    # HBM-scale layout from models/ntuple_big.LAYOUTS ("4x6", "5x6",
    # "4x6_4x4" — the literature's 6-tuple architectures, 67M-84M weights)
    # using bounded XLA gather/scatter (update_impl/value_impl ignored).
    arch: str = "small"
    # exponent domain per cell of the big-net tables (board exponents clip
    # to n_vals - 1; 16 covers tiles through 32768)
    n_vals: int = 16
    # multi-stage table thresholds (max-tile exponents, arXiv:1604.05085),
    # e.g. (11, 12) = separate tables before 2048 / 2048..4095 / from 4096
    thresholds: tuple[int, ...] = ()
    # delayed TC learning (arXiv:1604.05085): apply the dense table-sized
    # TC combine every k steps, scatter-accumulating the (sums, |sums|,
    # counts) statistics in between. 1 = combine every step (the round-4
    # behaviour). The dense combine is what makes STAGED training slow
    # (it scales with n_stages x table size — docs/PERF.md); k=8 removes
    # ~7/8 of that cost at the price of value lookups being up to k
    # steps stale (the chunk-sync sharded mode already tolerates
    # chunk_steps-stale tables). Big-net TC with scatter updates only;
    # chunk_steps must be divisible by it.
    tc_every: int = 1
    # carousel shaping (arXiv:1604.05085): probability that a finished
    # env restarts from a recorded stage-entry board instead of a fresh
    # one, so late stages see training data in proportion to this knob
    # rather than to how rarely full games reach them. 0 = off.
    # Requires a staged big net (thresholds non-empty).
    carousel: float = 0.0
    # stage-entry reservoir capacity per stage (random-replacement)
    carousel_slots: int = 256


def _fresh_boards(key: jax.Array, n: int) -> jax.Array:
    """n fresh boards — the batched env's own reset law (two spawns on an
    empty board, game2048_env.py:102-111), so env and TD can never drift."""
    from gym2048_tpu.env.batched import _fresh_boards as fresh

    return fresh(jax.random.uniform(key, (n, 4)))


def _greedy(table: jax.Array, board: jax.Array):
    """Greedy afterstate move for one board (gather value path).

    Returns ``(action, afterstate, reward, v_after, any_legal)``.
    """
    moved, scores, legal = rules.move_all(board)
    vals = jax.vmap(lambda b: ntuple.value(table, b))(moved)
    q = jnp.where(legal, scores.astype(jnp.float32) + vals, -jnp.inf)
    a = q.argmax()
    return (
        a.astype(jnp.int32),
        moved[a],
        scores[a].astype(jnp.float32),
        vals[a],
        legal.any(),
    )


def _greedy_batch(value_fn, boards: jax.Array):
    """Greedy afterstate move for ``(B, 4, 4)`` boards with a batched value
    function ``value_fn((N, 4, 4)) -> (N,)`` (gather or MXU path).

    Returns ``(action (B,), afterstate (B, 4, 4), reward (B,),
    v_after (B,), any_legal (B,))`` — the vectorised form of
    :func:`_greedy`, evaluating all ``4 B`` candidate afterstates in one
    ``value_fn`` call so the MXU path sees one large contraction.
    """
    b = boards.shape[0]
    moved, scores, legal = jax.vmap(rules.move_all)(boards)
    vals = value_fn(moved.reshape(b * 4, 4, 4)).reshape(b, 4)
    q = jnp.where(legal, scores.astype(jnp.float32) + vals, -jnp.inf)
    a = q.argmax(-1).astype(jnp.int32)
    sel = jnp.arange(4)[None, :] == a[:, None]
    after = jnp.where(sel[:, :, None, None], moved, 0).sum(1).astype(
        boards.dtype
    )
    r = jnp.where(sel, scores, 0).sum(-1).astype(jnp.float32)
    v_after = jnp.where(sel, vals, 0.0).sum(-1)
    return a, after, r, v_after, legal.any(-1)


def _carousel_record(car_b, car_f, st_prev, st_next, alive, next_state, key):
    """Record stage-entry boards into the per-stage reservoir.

    An env whose post-spawn state ``next_state`` entered a HIGHER stage
    than its pre-move state writes that board into a random slot of its
    new stage's row (random replacement — each slot is an approximately
    uniform sample of that stage's observed entry states). Non-crossing
    envs are redirected to the stage-0 row, which is never sampled
    (stage-0 restarts are fresh boards by definition), so the scatter
    needs no masking. Returns ``(car_b, car_f)`` updated.
    """
    n = st_prev.shape[0]
    r = car_b.shape[1]
    crossed = (st_next > st_prev) & alive
    slot = (jax.random.uniform(key, (n,)) * r).astype(jnp.int32)
    s_idx = jnp.where(crossed, st_next, 0)
    car_b = car_b.at[s_idx, slot].set(next_state)
    car_f = car_f.at[s_idx, slot].set(True)
    return car_b, car_f


def _carousel_restart(car_b, car_f, fresh, key, p):
    """Restart boards for resetting envs: with probability ``p`` (and a
    filled slot hit) a uniformly drawn stage>=1 reservoir board,
    otherwise the fresh two-tile board. Returns ``(B, 4, 4)`` boards.
    """
    n = fresh.shape[0]
    s, r = car_f.shape
    ku, ks, kj = jax.random.split(key, 3)
    use = jax.random.uniform(ku, (n,)) < p
    s_pick = 1 + (
        jax.random.uniform(ks, (n,)) * (s - 1)
    ).astype(jnp.int32)
    j_pick = (jax.random.uniform(kj, (n,)) * r).astype(jnp.int32)
    ok = use & car_f[s_pick, j_pick]
    return jnp.where(ok[:, None, None], car_b[s_pick, j_pick], fresh)


@dataclasses.dataclass
class TDLogEntry:
    steps: int
    episodes: float
    ep_score_mean: float
    highest_tile_max: int
    alpha: float
    wall: float


class TDTrainer:
    """Batched TD(0) afterstate trainer. ``learn()`` drives jitted chunks."""

    def __init__(self, config: TDConfig | None = None):
        self.cfg = config or TDConfig()
        self._net = None
        if self.cfg.arch != "small":
            from gym2048_tpu.models import ntuple_big

            on_tpu = jax.default_backend() == "tpu"
            vimpl = self.cfg.value_impl
            if vimpl in ("auto", "mxu", "mxu_bf16"):
                # the small-net MXU modes don't exist at HBM scale; the
                # row form measured slightly ahead of the scalar gather
                # on v5e inside full chunks (174k vs 170k steps/s)
                vimpl = "rows" if on_tpu else "gather"
            uimpl = self.cfg.update_impl
            if uimpl in ("auto", "mxu"):
                # channel-split scalar scatters are the fast update form
                # on TPU (11.3 ms vs 26.3 ms stacked / 27.0 ms rows at
                # 262k indices — docs/PERF.md round-4 study)
                uimpl = "scatter"
            self._net = ntuple_big.make_network(
                self.cfg.arch, self.cfg.n_vals, self.cfg.thresholds,
                value_impl=vimpl, update_impl=uimpl,
            )
            if self.cfg.tc_every != 1:
                assert self.cfg.tc and self.cfg.tc_every > 1, (
                    "tc_every requires tc=True and a value > 1"
                )
                assert self.cfg.chunk_steps % self.cfg.tc_every == 0, (
                    "chunk_steps must divide into tc_every windows",
                    self.cfg.chunk_steps, self.cfg.tc_every,
                )
                assert self._net.update_impl == "scatter", (
                    "delayed TC accumulates via the scatter update path"
                )
            if self.cfg.carousel:
                assert self.cfg.thresholds, (
                    "carousel shaping restarts from stage-entry states — "
                    "configure multi-stage thresholds"
                )
                assert 0.0 < self.cfg.carousel <= 1.0, self.cfg.carousel
            return  # big nets use their own gather/scatter/row paths
        assert self.cfg.tc_every == 1 and not self.cfg.carousel, (
            "tc_every/carousel are big-net staged-training features"
        )
        assert not self.cfg.thresholds, (
            "staged training is configured via promote_table for the small "
            "net; thresholds apply to big-net archs"
        )
        on_tpu = jax.default_backend() == "tpu"
        impl = self.cfg.update_impl
        if impl == "auto":
            impl = "mxu" if on_tpu else "scatter"
        assert impl in ("scatter", "mxu"), impl
        self._td_update = (
            ntuple.td_update_mxu if impl == "mxu" else ntuple.td_update
        )
        self._td_update_tc = (
            ntuple.td_update_tc_mxu if impl == "mxu" else ntuple.td_update_tc
        )
        vimpl = self.cfg.value_impl
        if vimpl == "auto":
            vimpl = "mxu" if on_tpu else "gather"
        assert vimpl in ("gather", "mxu", "mxu_bf16"), vimpl
        self._value_impl = vimpl

    def init_state(self, key: jax.Array | None = None):
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        key, k0 = jax.random.split(key)
        if self._net is not None:
            table = self._net.init_table(cfg.init_value)
        else:
            # per-entry x gives value(board) = 136x/8 = 17x ~= init_value
            table = ntuple.init_table(cfg.init_value / ntuple.N_TUPLES)
        boards = _fresh_boards(k0, cfg.n_envs)
        state = {
            "table": table,
            "boards": boards,
            "score": jnp.zeros(cfg.n_envs, jnp.float32),
            # delayed-update carry: previous step's chosen afterstate, its
            # value at selection time, and whether it still awaits a target
            # (a distinct buffer from `boards` — donation forbids aliases)
            "prev_after": jnp.zeros_like(boards),
            "prev_v": jnp.zeros(cfg.n_envs, jnp.float32),
            "prev_valid": jnp.zeros(cfg.n_envs, bool),
            "key": key,
        }
        if cfg.tc:
            state["tc_e"] = jnp.zeros_like(table)
            state["tc_a"] = jnp.zeros_like(table)
        if cfg.carousel:
            s = self._net.n_stages
            state["car_boards"] = jnp.zeros(
                (s, cfg.carousel_slots, 4, 4), boards.dtype
            )
            state["car_filled"] = jnp.zeros(
                (s, cfg.carousel_slots), bool
            )
        return state

    def _chunk_body(self, alpha, defer_tc: bool = False):
        """The per-step scan body, shared by :meth:`train_chunk` (global
        batch) and :meth:`make_sharded_chunk` (per-device shard inside
        ``shard_map``). Shape-polymorphic in the env-batch axis: all batch
        sizes come from ``carry["boards"].shape[0]``, never from the config,
        so the same body runs on a device-local slice.

        ``defer_tc``: accumulate the TC statistics into carried
        ``tc_ps``/``tc_pa``/``tc_pc`` pending buffers instead of applying
        the dense combine — the inner step of delayed TC learning
        (:meth:`_scan_steps` applies the combine every ``cfg.tc_every``
        steps).
        """
        cfg = self.cfg

        def body(carry, _):
            n_envs = carry["boards"].shape[0]
            table = carry["table"]
            boards, score = carry["boards"], carry["score"]
            if cfg.carousel:
                key, kv, kp, kr, kcr, kcs = jax.random.split(
                    carry["key"], 6
                )
            else:
                key, kv, kp, kr = jax.random.split(carry["key"], 4)

            if self._net is not None:
                value_fn = self._net.make_value_fn(table)
            elif self._value_impl.startswith("mxu"):
                t_hi, t_lo = ntuple.split_table(table)
                if self._value_impl == "mxu_bf16":
                    t_lo = None
                value_fn = lambda bs: ntuple.value_batch_mxu(t_hi, t_lo, bs)
            else:
                value_fn = lambda bs: ntuple.value_batch(table, bs)
            a, after, r, v_after, alive = _greedy_batch(value_fn, boards)

            # TD update for the PREVIOUS afterstate: its successor state is
            # `boards`; target = r + V(after) if a move exists, else 0.
            # prev_valid masks just-reset envs out of both the deltas and
            # the occurrence counts (their zero-delta rows would otherwise
            # dilute colliding entries' mean update toward 0).
            target = jnp.where(alive, r + v_after, 0.0)
            delta = target - carry["prev_v"]
            new = dict(carry)
            update_tc = (
                self._net.td_update_tc if self._net is not None
                else self._td_update_tc
            )
            update_td = (
                self._net.td_update if self._net is not None
                else self._td_update
            )
            if cfg.tc and defer_tc:
                pend = (carry["tc_ps"], carry["tc_pa"], carry["tc_pc"])
                (
                    new["tc_ps"], new["tc_pa"], new["tc_pc"]
                ) = self._net.tc_accumulate(
                    pend, carry["prev_after"], delta,
                    valid=carry["prev_valid"],
                )
            elif cfg.tc:
                new["table"], new["tc_e"], new["tc_a"] = update_tc(
                    table, carry["tc_e"], carry["tc_a"], carry["prev_after"],
                    delta, alpha, valid=carry["prev_valid"],
                )
            else:
                new["table"] = update_td(
                    table, carry["prev_after"], delta, alpha,
                    valid=carry["prev_valid"],
                )

            next_state = jax.vmap(rules.spawn)(
                after,
                jax.random.uniform(kv, (n_envs,)),
                jax.random.uniform(kp, (n_envs,)),
            )

            # episode bookkeeping: a board resets when it has no legal move
            score = score + jnp.where(alive, r, 0.0)
            done = ~alive
            n_done = done.sum().astype(jnp.float32)
            done_score = jnp.where(done, score, 0.0).sum()
            highest = boards.max()

            fresh = _fresh_boards(kr, n_envs)
            if cfg.carousel:
                from gym2048_tpu.models.ntuple import stage_of_batch

                thr = self._net.thresholds
                car_b, car_f = _carousel_record(
                    carry["car_boards"], carry["car_filled"],
                    stage_of_batch(boards, thr),
                    stage_of_batch(next_state, thr),
                    alive, next_state, kcr,
                )
                fresh = _carousel_restart(
                    car_b, car_f, fresh, kcs, cfg.carousel
                )
                new["car_boards"], new["car_filled"] = car_b, car_f
            new["boards"] = jnp.where(done[:, None, None], fresh, next_state)
            new["score"] = jnp.where(done, 0.0, score)
            new["prev_after"] = after
            new["prev_v"] = v_after
            new["prev_valid"] = alive
            new["key"] = key

            stats = (n_done, done_score, highest)
            return new, stats

        return body

    def _scan_steps(self, carry, alpha, length):
        """Scan ``length`` TD steps. With ``cfg.tc_every > 1`` (delayed TC,
        arXiv:1604.05085) the scan nests: inner scans of ``tc_every``
        steps scatter-accumulate the TC statistics into table-sized
        pending buffers, and the dense combine runs once per window —
        the buffers live only inside this call (they are zero at every
        window boundary), so the training-state layout, checkpoints and
        sharding specs are unchanged.
        """
        cfg = self.cfg
        if not (cfg.tc and cfg.tc_every > 1):
            return jax.lax.scan(
                self._chunk_body(alpha), carry, None, length=length
            )
        from gym2048_tpu.models.ntuple import _tc_combine

        k = cfg.tc_every
        assert length % k == 0, (length, k)
        inner = self._chunk_body(alpha, defer_tc=True)

        def window(c, _):
            c, stats = jax.lax.scan(inner, c, None, length=k)
            c = dict(c)
            c["table"], c["tc_e"], c["tc_a"] = _tc_combine(
                c["table"], c["tc_e"], c["tc_a"],
                c["tc_ps"], c["tc_pa"], c["tc_pc"], alpha,
            )
            for p in ("tc_ps", "tc_pa", "tc_pc"):
                c[p] = jnp.zeros_like(c[p])
            return c, stats

        carry = dict(carry)
        for p in ("tc_ps", "tc_pa", "tc_pc"):
            carry[p] = jnp.zeros_like(carry["table"])
        carry, stats = jax.lax.scan(
            window, carry, None, length=length // k
        )
        for p in ("tc_ps", "tc_pa", "tc_pc"):
            del carry[p]
        stats = jax.tree.map(
            lambda s: s.reshape((length,) + s.shape[2:]), stats
        )
        return carry, stats

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_chunk(self, state: dict, alpha: jax.Array):
        """``cfg.chunk_steps`` TD steps over all envs, one device program.

        One greedy search per step: the TD target for step t-1's afterstate
        is assembled from step t's greedy result (``r_t + V(after_t)``, or 0
        if the state is terminal), so each board is searched exactly once
        per move — a one-step-delayed update with ``prev_v`` one scatter-add
        stale, the standard tradeoff in batched TD implementations.
        """
        new_state, (n_done, done_score, highest) = self._scan_steps(
            dict(state), alpha, self.cfg.chunk_steps
        )
        metrics = {
            "episodes": n_done.sum(),
            "ep_score_mean": done_score.sum()
            / jnp.maximum(n_done.sum(), 1.0),
            "highest_exp": highest.max().astype(jnp.int32),
        }
        return new_state, metrics

    def make_sharded_chunk(self, mesh):
        """Chunk-synchronous data-parallel TD over a ``(data, model)`` mesh.

        Running :meth:`train_chunk` directly on sharded state keeps replicas
        bit-identical but XLA then resolves the scatter into the replicated
        table as a DENSE per-step all-reduce — 17 MB/step for the small net,
        ~800 MB/step for a 67M-entry TC big net (measured in HLO,
        tests/test_td.py::test_sharded_chunk_collective_audits) — which
        swamps ICI long before the compute does. This builder returns the
        scalable alternative: a jitted ``fn(state, alpha) -> (state,
        metrics)`` where each device runs the whole ``chunk_steps`` scan
        LOCALLY on its board shard against its own table copy, and the
        accumulated table deltas are summed with ONE psum per chunk
        (``chunk_steps`` x less traffic; the standard local-learner
        tradeoff — within a chunk, devices don't see each other's updates).

        Per-device RNG streams are decorrelated by folding the device index
        into the chunk key; the state key advances identically everywhere,
        so the returned state keeps the :func:`shard_td_state` layout
        (batch keys sharded, table/accumulators/key replicated) and chunks
        can be chained. With a 1-device ``data`` axis the delta/psum merge
        is skipped entirely and results are bit-identical to
        :meth:`train_chunk`.
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from gym2048_tpu.parallel.mesh import DATA_AXIS

        cfg = self.cfg
        n_data = mesh.shape[DATA_AXIS]
        assert cfg.n_envs % n_data == 0, (cfg.n_envs, n_data)
        state_keys = {"table", "boards", "score", "prev_after", "prev_v",
                      "prev_valid", "key"} | ({"tc_e", "tc_a"} if cfg.tc
                                              else set())
        if cfg.carousel:
            # each device keeps its own reservoir shard over the SLOT
            # axis (reservoir writes are not additive, so they cannot
            # ride the delta-psum merge; a per-device reservoir fed by
            # the local env shard is semantically the same sampler)
            assert cfg.carousel_slots % n_data == 0, (
                cfg.carousel_slots, n_data
            )
            state_keys |= {"car_boards", "car_filled"}

        def spec(k):
            if k in ("car_boards", "car_filled"):
                return P(None, DATA_AXIS)
            return P(DATA_AXIS) if k in _BATCH_KEYS else P()

        in_specs = ({k: spec(k) for k in state_keys}, P())
        out_specs = ({k: spec(k) for k in state_keys},
                     {"episodes": P(), "ep_score_mean": P(),
                      "highest_exp": P()})

        def local_chunk(state, alpha):
            ref = {k: state[k] for k in ("table", "tc_e", "tc_a")
                   if k in state}
            local = dict(state)
            if n_data > 1:
                local["key"] = jax.random.fold_in(
                    state["key"], jax.lax.axis_index(DATA_AXIS)
                )
            new, (n_done, done_score, highest) = self._scan_steps(
                local, alpha, cfg.chunk_steps
            )
            if n_data > 1:
                # merge the chunk's local table/accumulator deltas (all
                # additive) with one psum each, then advance the shared key
                # deterministically from the chunk's replicated input key.
                for k, t0 in ref.items():
                    new[k] = t0 + jax.lax.psum(new[k] - t0, DATA_AXIS)
                new["key"] = jax.random.split(state["key"], 1)[0]
            n_done = jax.lax.psum(n_done.sum(), DATA_AXIS)
            done_score = jax.lax.psum(done_score.sum(), DATA_AXIS)
            metrics = {
                "episodes": n_done,
                "ep_score_mean": done_score / jnp.maximum(n_done, 1.0),
                "highest_exp": jax.lax.pmax(
                    highest.max(), DATA_AXIS
                ).astype(jnp.int32),
            }
            return new, metrics

        sharded = shard_map(
            local_chunk, mesh=mesh, in_specs=in_specs,
            out_specs=out_specs, check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=0)

    def learn(
        self,
        state=None,
        log_every: int = 50,
        log_fn=print,
        ckpt_path=None,
        ckpt_every: int = 0,
        start_chunk: int = 0,
        max_chunks: int | None = None,
        mesh=None,
    ):
        """Run training; the step count is rounded UP to whole chunks
        (``n_envs * chunk_steps``), so the actual steps trained — reported
        in the log and in :class:`TDLogEntry` — can exceed
        ``cfg.total_steps`` by up to one chunk.

        ``ckpt_path`` + ``ckpt_every`` (chunks) enable full-fidelity
        checkpoints via :func:`save_train_state` — the WHOLE training
        state including the TC accumulators, env batch, RNG key and the
        chunk counter, so a crashed or interrupted run resumes
        bit-continuously (pass the restored state and ``start_chunk``;
        the alpha schedule position follows from the chunk counter).
        ``max_chunks`` bounds how many chunks THIS call runs (phased
        training) without changing the schedule, which always spans the
        full ``total_steps``.

        ``mesh`` switches to data-parallel training over a ``(data,
        model)`` mesh: the state is placed with :func:`shard_td_state`
        and chunks run through :meth:`make_sharded_chunk` (chunk-sync,
        one table psum per chunk — the docs/MULTIHOST.md procedure, now
        one call instead of hand-written driver code).
        """
        cfg = self.cfg
        if state is None:
            state = self.init_state()
        chunk_fn = self.train_chunk
        if mesh is not None:
            state = shard_td_state(state, mesh)
            chunk_fn = self.make_sharded_chunk(mesh)
        steps_per_chunk = cfg.n_envs * cfg.chunk_steps
        n_chunks = -(-cfg.total_steps // steps_per_chunk)  # ceil
        if log_fn is not None and n_chunks * steps_per_chunk != cfg.total_steps:
            log_fn(
                f"total_steps {cfg.total_steps} rounded up to "
                f"{n_chunks * steps_per_chunk} "
                f"({n_chunks} chunks of {steps_per_chunk})"
            )
        t0 = time.time()
        history = []
        stop = n_chunks if max_chunks is None else min(
            n_chunks, start_chunk + max_chunks
        )
        for c in range(start_chunk, stop):
            frac = c / max(n_chunks - 1, 1)
            alpha = cfg.alpha + (cfg.alpha_final - cfg.alpha) * frac
            state, metrics = chunk_fn(state, jnp.float32(alpha))
            if ckpt_path and ckpt_every and (
                (c + 1) % ckpt_every == 0 or c + 1 == stop
            ):
                save_train_state(ckpt_path, state, cfg, chunks_done=c + 1)
            if (c + 1) % log_every == 0 or c + 1 == stop:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                entry = TDLogEntry(
                    steps=(c + 1) * steps_per_chunk,
                    episodes=m["episodes"],
                    ep_score_mean=m["ep_score_mean"],
                    highest_tile_max=int(2 ** m["highest_exp"]),
                    alpha=alpha,
                    wall=time.time() - t0,
                )
                history.append(entry)
                if log_fn is not None:
                    # rate over THIS call only (entry.steps is cumulative
                    # across resumes; entry.wall is not)
                    run_steps = (c + 1 - start_chunk) * steps_per_chunk
                    log_fn(
                        f"steps {entry.steps} ep_score "
                        f"{entry.ep_score_mean:.0f} highest "
                        f"{entry.highest_tile_max} alpha {alpha:.3f} "
                        f"({run_steps / entry.wall / 1e3:.0f}k steps/s)"
                    )
        return state, history


TRAIN_STATE_FORMAT = "td_train_state_v1"


def save_train_state(path, state: dict, cfg: TDConfig, chunks_done: int):
    """Durable full-fidelity TD checkpoint (atomic write): every state
    leaf — table, TC accumulators ``tc_e``/``tc_a``, env boards/scores,
    delayed-update carry, RNG key — plus the chunk counter, so resuming
    continues the exact trajectory (the round-3 phased runs instead kept
    accumulators alive in a process namespace, which is what lost the
    flagship table when the session died — VERDICT round 3 / CLAUDE.md)."""
    import os

    from gym2048_tpu.utils.checkpoint import save_model

    tmp = str(path) + ".tmp"
    save_model(
        tmp,
        {k: np.asarray(v) for k, v in state.items()},
        meta={
            "format": TRAIN_STATE_FORMAT,
            "config": dataclasses.asdict(cfg),
            "chunks_done": int(chunks_done),
        },
    )
    os.replace(tmp, path)


def load_train_state(path) -> tuple[dict, dict]:
    """Load a :func:`save_train_state` checkpoint -> ``(state, meta)``
    with device arrays; raises if the file is a bare table pickle."""
    from gym2048_tpu.utils.checkpoint import load_model

    variables, meta = load_model(path)
    assert meta.get("format") == TRAIN_STATE_FORMAT, (
        f"{path} is not a TD train-state checkpoint (meta {meta.keys()})"
    )
    return {k: jnp.asarray(v) for k, v in variables.items()}, meta


def is_train_state(path) -> bool:
    """True when ``path`` holds a full train-state checkpoint (vs a bare
    table .pkl from ``save_model``)."""
    from gym2048_tpu.utils.checkpoint import load_model

    try:
        _, meta = load_model(path)
    except Exception:
        return False
    return meta.get("format") == TRAIN_STATE_FORMAT


# state dict keys whose leading axis is the env batch (shard over `data`);
# everything else — the table and the PRNG key — replicates. Selecting by
# KEY, not by shape: with tiny n_envs a replicated leaf can coincidentally
# match the batch size (e.g. the (2,) PRNG key at n_envs == 2).
_BATCH_KEYS = frozenset(
    {"boards", "score", "prev_after", "prev_v", "prev_valid"}
)


def shard_td_state(state: dict, mesh) -> dict:
    """Place a TD training state on a ``(data, model)`` mesh.

    Data parallelism for TD: the env batch (``boards``/``score``/``prev_*``)
    shards over ``data``; the table (and TC accumulators) and the key
    replicate. Two execution modes consume this layout:

    * :meth:`TDTrainer.train_chunk` straight on the sharded state —
      bit-identical replicas, but XLA materialises the scatter into the
      replicated table as a DENSE table-sized all-reduce EVERY STEP
      (verified in HLO by tests/test_td.py::test_sharded_chunk_collective_audits);
      acceptable for the 5.7 MB small net on fast ICI, ruinous for the
      HBM-scale nets.
    * :meth:`TDTrainer.make_sharded_chunk` — chunk-synchronous local TD,
      one table psum per ``chunk_steps`` steps; the scalable mode.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from gym2048_tpu.parallel import replicate, shard_batch
    from gym2048_tpu.parallel.mesh import DATA_AXIS

    data, rep = shard_batch(mesh), replicate(mesh)
    slots = NamedSharding(mesh, P(None, DATA_AXIS))  # carousel reservoirs

    def placement(k):
        if k in ("car_boards", "car_filled"):
            return slots
        return data if k in _BATCH_KEYS else rep

    return {k: jax.device_put(v, placement(k)) for k, v in state.items()}


def play_greedy(
    table: jax.Array,
    episodes: int,
    key: jax.Array | None = None,
    move_cap: int = 30000,
    value_impl: str = "auto",
    net=None,
) -> dict:
    """Play full games with the greedy afterstate policy (evaluation).

    ``value_impl`` defaults to the EXACT paths (split-bf16 "mxu" on TPU,
    gather elsewhere) — evaluation scores should never carry lookup noise
    even though training defaults to the cheaper "mxu_bf16". Pass ``net``
    (an :class:`~gym2048_tpu.models.ntuple_big.NTupleNetwork`) to evaluate
    a big-net table; ``value_impl`` is then ignored.

    The table enters the jitted loop as an ARGUMENT, never a closure —
    closed-over arrays become HLO constants and HBM-scale tables then
    break the remote compile (HTTP 413; see expectimax.play_policy).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if net is not None:
        params = table
        value_of = lambda t, bs: net.value_batch(t, bs)
    else:
        if value_impl == "auto":
            value_impl = (
                "mxu" if jax.default_backend() == "tpu" else "gather"
            )
        if value_impl.startswith("mxu"):
            t_hi, t_lo = ntuple.split_table(table)
            if value_impl == "mxu_bf16":
                t_lo = None
            params = (t_hi, t_lo)
            value_of = lambda p, bs: ntuple.value_batch_mxu(p[0], p[1], bs)
        else:
            params = table
            value_of = lambda t, bs: ntuple.value_batch(t, bs)

    @jax.jit
    def run(params, key):
        value_fn = lambda bs: value_of(params, bs)
        key, k0 = jax.random.split(key)
        boards = _fresh_boards(k0, episodes)
        total = jnp.zeros(episodes, jnp.float32)
        moves = jnp.zeros(episodes, jnp.int32)
        high = jnp.zeros(episodes, jnp.int32)
        active = jnp.ones(episodes, bool)

        def cond(c):
            return c[4].any() & (c[5] < move_cap)

        def body(c):
            boards, total, moves, high, active, t, key = c
            key, kv, kp = jax.random.split(key, 3)
            a, after, r, v, alive = _greedy_batch(value_fn, boards)
            nxt = jax.vmap(rules.spawn)(
                after,
                jax.random.uniform(kv, (episodes,)),
                jax.random.uniform(kp, (episodes,)),
            )
            step_live = active & alive
            total += jnp.where(step_live, r, 0.0)
            moves += step_live.astype(jnp.int32)
            high = jnp.maximum(
                high, jnp.where(step_live, nxt.max((-1, -2)), 0).astype(
                    jnp.int32
                )
            )
            boards = jnp.where(step_live[:, None, None], nxt, boards)
            active = step_live
            return boards, total, moves, high, active, t + 1, key

        c = (boards, total, moves, high, active, jnp.int32(0), key)
        c = jax.lax.while_loop(cond, body, c)
        return c[1], c[2], c[3]

    total, moves, high = map(np.asarray, run(params, key))
    return {
        "Average score": float(total.mean()),
        "Max score": float(total.max()),
        "Highest tile": int(2 ** high.max()) if high.max() > 0 else 0,
        "Episodes": [
            {
                "total_reward": float(total[i]),
                "highest": int(2 ** high[i]) if high[i] > 0 else 0,
                "moves": int(moves[i]),
            }
            for i in range(episodes)
        ],
    }


def main(argv: list[str] | None = None) -> None:
    import argparse
    import collections
    import json

    from gym2048_tpu.utils.checkpoint import load_model, save_model

    p = argparse.ArgumentParser(
        description="TD(0) afterstate training of an n-tuple network."
    )
    p.add_argument("--steps", type=int, default=TDConfig.total_steps)
    p.add_argument("--envs", type=int, default=TDConfig.n_envs)
    p.add_argument("--alpha", type=float, default=TDConfig.alpha)
    p.add_argument("--alpha-final", type=float, default=TDConfig.alpha_final)
    p.add_argument("--init-value", type=float, default=TDConfig.init_value)
    p.add_argument(
        "--chunk-steps", type=int, default=TDConfig.chunk_steps,
        help="scan length per jitted chunk; total steps round up to "
        "whole chunks of envs*chunk_steps",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--update-impl", choices=("auto", "scatter", "mxu", "rows"),
        default="auto",
        help="table update path: XLA scatter, MXU one-hot matmul (small "
        "net), or 128-lane row scatter (big nets)",
    )
    p.add_argument(
        "--value-impl",
        choices=("auto", "gather", "mxu", "mxu_bf16", "rows"),
        default="auto",
        help="value-lookup path; mxu_bf16 trades ~0.4%% value noise for "
        "half the lookup FLOPs (small net); rows = 128-lane row gather "
        "(big nets)",
    )
    p.add_argument(
        "--arch", default="small",
        help='network architecture: "small" (17x4-cell, MXU paths) or an '
        "HBM layout from models/ntuple_big.LAYOUTS (4x6, 5x6, 4x6_4x4)",
    )
    p.add_argument(
        "--n-vals", type=int, default=TDConfig.n_vals,
        help="big-net exponent domain per cell (clip above)",
    )
    p.add_argument(
        "--thresholds", type=int, nargs="*", default=[],
        help="big-net multi-stage max-tile exponent thresholds, e.g. 11 12",
    )
    p.add_argument(
        "--tc-every", type=int, default=TDConfig.tc_every,
        help="delayed TC learning (arXiv:1604.05085): apply the dense TC "
        "combine every k steps (big-net TC only; must divide "
        "--chunk-steps). Removes the staged-table combine overhead",
    )
    p.add_argument(
        "--carousel", type=float, default=TDConfig.carousel,
        help="carousel shaping (arXiv:1604.05085): probability a finished "
        "env restarts from a recorded stage-entry board (staged big "
        "nets only; 0 = off)",
    )
    p.add_argument(
        "--carousel-slots", type=int, default=TDConfig.carousel_slots,
        help="stage-entry reservoir slots per stage",
    )
    p.add_argument(
        "--tc", action="store_true",
        help="temporal-coherence per-entry adaptive rates (set --alpha "
        "and --alpha-final to the meta-rate, typically 1.0); use "
        "--ckpt to save the accumulators with the rest of the state",
    )
    p.add_argument("--eval-episodes", type=int, default=128)
    p.add_argument("--output", default="ntuple_table.pkl")
    p.add_argument(
        "--resume", default=None,
        help="checkpoint to continue: a --ckpt train-state file resumes "
        "the FULL state (table, TC accumulators, env batch, RNG key, "
        "chunk counter — bit-continuous); a bare table .pkl seeds just "
        "the table",
    )
    p.add_argument(
        "--ckpt", default=None,
        help="path for periodic full train-state checkpoints "
        "(atomic overwrite; resumable with --resume)",
    )
    p.add_argument(
        "--ckpt-every", type=int, default=50,
        help="chunks between --ckpt saves",
    )
    p.add_argument(
        "--sharded", action="store_true",
        help="data-parallel training over all visible devices via the "
        "(data, model) mesh — chunk-synchronous mode, one table psum "
        "per chunk (docs/MULTIHOST.md; combine with "
        "gym2048_tpu.parallel.init_distributed env vars for multi-host)",
    )
    args = p.parse_args(argv)

    if args.arch == "small":
        # the "rows" paths are the big-net 128-lane forms; catch the
        # mismatch here with a clear message instead of the trainer's
        # bare AssertionError
        if args.update_impl == "rows" or args.value_impl == "rows":
            p.error(
                '--update-impl/--value-impl "rows" applies to the big-net '
                'architectures only (--arch 4x6/5x6/4x6_4x4); the small '
                'net supports auto/scatter/mxu updates and '
                'auto/gather/mxu/mxu_bf16 values'
            )

    cfg = TDConfig(
        total_steps=args.steps, n_envs=args.envs, alpha=args.alpha,
        alpha_final=args.alpha_final, init_value=args.init_value,
        seed=args.seed, chunk_steps=args.chunk_steps,
        update_impl=args.update_impl, value_impl=args.value_impl,
        tc=args.tc, arch=args.arch, n_vals=args.n_vals,
        thresholds=tuple(args.thresholds), tc_every=args.tc_every,
        carousel=args.carousel, carousel_slots=args.carousel_slots,
    )
    trainer = TDTrainer(cfg)
    state = trainer.init_state()
    start_chunk = 0
    if args.resume:
        if is_train_state(args.resume):
            state, meta = load_train_state(args.resume)
            start_chunk = meta["chunks_done"]
            print(
                f"resumed full train state at chunk {start_chunk} "
                f"({start_chunk * cfg.n_envs * cfg.chunk_steps} steps)"
            )
        else:
            variables, _meta = load_model(args.resume)
            state["table"] = jnp.asarray(variables["table"])
    mesh = None
    if args.sharded:
        from gym2048_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"sharded training over mesh {dict(mesh.shape)}")
    state, history = trainer.learn(
        state, ckpt_path=args.ckpt, ckpt_every=args.ckpt_every,
        start_chunk=start_chunk, mesh=mesh,
    )
    save_model(
        args.output, {"table": np.asarray(state["table"])},
        meta={"config": dataclasses.asdict(cfg)},
    )

    ev = play_greedy(
        state["table"], args.eval_episodes,
        jax.random.PRNGKey(args.seed + 1), net=trainer._net,
    )
    dist = collections.Counter(e["highest"] for e in ev["Episodes"])
    print(
        json.dumps(
            {
                "steps": history[-1].steps if history else 0,
                "requested_steps": args.steps,
                "Average score": ev["Average score"],
                "Max score": ev["Max score"],
                "Highest tile": ev["Highest tile"],
                "tile_distribution": dict(sorted(dist.items())),
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
