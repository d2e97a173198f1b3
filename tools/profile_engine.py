"""Attribute continuous-engine wall time to phases: admit prefills, decode
segments, flow chunk groups, vocode+wav fetch, host scheduling.

Wraps the bench's own engine section (BENCH_ONLY=engine) with synchronizing
timers around the jitted programs.  The forced host reads serialize the
dispatch-ahead overlap, so the profiled total is a touch larger than the
bench's aggregate number — the point is the per-phase split, which tells us
what to optimize (round-2 VERDICT #3: 8-stream aggregate is 3.7x below the
one-shot batch-8 ceiling).

Usage:  python tools/profile_engine.py            # 8 sessions x 150 tokens
        PROFILE_SESSIONS=16 python tools/profile_engine.py
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PH = defaultdict(float)
N = defaultdict(int)
CALLS = defaultdict(list)   # per-call durations, to separate warmup compiles


def _sync(x):
    """Force a real device->host read (block_until_ready does not observably
    wait through the remote tunnel)."""
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def install_probes():
    import cosyvoice_tpu.runtime.engine as E
    import cosyvoice_tpu.runtime.serving as S
    from cosyvoice_tpu.runtime.model import CosyVoice2Model

    orig_seg = E.engine_decode_segment

    def timed_seg(model, params, state, n_steps):
        t0 = time.time()
        st = orig_seg(model, params, state, n_steps)
        _sync(st.count)
        dt = time.time() - t0
        PH["decode_segment"] += dt
        N["decode_segment"] += 1
        CALLS["decode_segment"].append(dt)
        return st

    E.engine_decode_segment = timed_seg

    for name in ("engine_admit", "engine_admit_pho"):
        orig = getattr(E, name)

        def timed_admit(*a, _orig=orig, **kw):
            t0 = time.time()
            st = _orig(*a, **kw)
            _sync(st.count)
            dt = time.time() - t0
            PH["admit"] += dt
            N["admit"] += 1
            CALLS["admit"].append(dt)
            return st

        setattr(E, name, timed_admit)

    orig_flush = S.ContinuousSynthesizer._flush_group

    def timed_flush(self, jobs, emit, streaming):
        if not hasattr(self, "_profiled_flow"):
            inner = self._flow_ragged

            def timed_flow(*a, **kw):
                t0 = time.time()
                mel = inner(*a, **kw)
                _sync(mel)
                dt = time.time() - t0
                PH["flow_group"] += dt
                N["flow_group"] += 1
                CALLS["flow_group"].append(dt)
                PH["flow_rows"] += a[1].shape[0] * a[1].shape[1]
                return mel

            self._flow_ragged = timed_flow
            self._profiled_flow = True
        t0 = time.time()
        orig_flush(self, jobs, emit, streaming)
        PH["flush_total"] += time.time() - t0
        N["flush_total"] += 1

    S.ContinuousSynthesizer._flush_group = timed_flush

    orig_voc = CosyVoice2Model.mel2wav_group

    def timed_voc(self, *a, **kw):
        t0 = time.time()
        out = orig_voc(self, *a, **kw)
        dt = time.time() - t0
        PH["vocode_group"] += dt
        N["vocode_group"] += 1
        CALLS["vocode_group"].append(dt)
        return out

    CosyVoice2Model.mel2wav_group = timed_voc

    # r5: incremental flow engine probes — FlowSlotEngine.chunk (all-slots
    # jitted chunk program + host scatter) and the group vocode twins
    from cosyvoice_tpu.runtime.flow_engine import FlowSlotEngine

    orig_chunk = FlowSlotEngine.chunk

    def timed_chunk(self, slots, tokens, *a, **kw):
        t0 = time.time()
        mel = orig_chunk(self, slots, tokens, *a, **kw)
        _sync(mel)
        dt = time.time() - t0
        key = f"flow_inc_M{tokens.shape[1]}"
        PH[key] += dt
        N[key] += 1
        CALLS[key].append(dt)
        PH["flow_inc"] += dt
        N["flow_inc"] += 1
        PH["flow_inc_jobs"] += len(slots)
        return mel

    FlowSlotEngine.chunk = timed_chunk

    for name in ("mel2wav_stream_group", "mel2wav_final_group"):
        orig_g = getattr(CosyVoice2Model, name)

        def timed_g(self, *a, _orig=orig_g, _n=name, **kw):
            t0 = time.time()
            out = _orig(self, *a, **kw)
            dt = time.time() - t0
            PH[_n] += dt
            N[_n] += 1
            CALLS[_n].append(dt)
            return out

        setattr(CosyVoice2Model, name, timed_g)


def main():
    n_sessions = int(os.environ.get("PROFILE_SESSIONS", "8"))
    etokens = int(os.environ.get("PROFILE_TOKENS", "150"))
    install_probes()

    # reuse the bench's model construction by running its engine section with
    # our probes installed; engine_measure logs aggregate itself.  We patch
    # its measurement loop indirectly: just run bench with BENCH_ONLY=engine
    # and harvest PH between runs via a report hook at exit.
    os.environ["BENCH_ONLY"] = "engine"
    os.environ["BENCH_ENGINE_SESSIONS"] = str(n_sessions)
    os.environ["BENCH_ENGINE_TOKENS"] = str(etokens)

    import bench

    # reset phase counters after warmup by wrapping log — simplest: let the
    # whole section run (warmup + 2 timed reps) and report totals; warmup
    # compiles are excluded because executables are cached from prior runs,
    # but first-call overheads remain, so interpret ratios, not absolutes.
    t0 = time.time()
    bench.main()
    total = time.time() - t0

    print("\n==== engine phase attribution ====", file=sys.stderr)
    acct = 0.0
    for k in sorted(PH):
        if k.endswith("_rows"):
            continue
        print(f"  {k:16s} {PH[k]:8.2f}s  over {N[k]:4d} calls "
              f"({PH[k] / max(N[k], 1) * 1000:7.1f} ms/call)", file=sys.stderr)
        acct += PH[k] if k != "flush_total" else 0.0
    # flush_total double-counts flow_group + vocode_group
    host = total - acct
    print(f"  flow rows processed: {int(PH.get('flow_rows', 0))} "
          f"(token-rows incl. pad)", file=sys.stderr)
    for k, v in sorted(CALLS.items()):
        pc = " ".join(f"{x * 1000:.0f}" for x in v)
        print(f"  per-call ms {k}: {pc}", file=sys.stderr)
    print(f"  accounted device phases: {acct:.2f}s of {total:.2f}s total "
          f"(rest = host sched/python/init {host:.2f}s incl. param init)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
