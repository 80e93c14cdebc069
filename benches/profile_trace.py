"""Real per-op device trace of the query block (VERDICT r04 ask #2).

Runs the full query-block program under ``jax.profiler.trace`` and parses
the resulting ``*.xplane.pb`` with a minimal hand-rolled protobuf walker
(no tensorboard/tensorflow in this image), then prints per-op device time
aggregated by fused-op name.  This replaces the round-4 subtraction
estimates, which PROFILE_r04.md itself flagged as fusion-sensitive.

Run under an external ``timeout`` -- a naive trace attempt wedged the
client on this platform in round 4; losing the process to a timeout only
costs the ~3 min chip handoff.

Usage: timeout 590 python benches/profile_trace.py [outdir]
"""
import glob
import gzip
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REFS = int(os.environ.get("BENCH_REFS", "10"))
REF_LEN = int(os.environ.get("BENCH_REF_LEN", "2000000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "4"))


# ---------------------------------------------------------------------------
# minimal protobuf wire-format walker (xplane.proto field numbers inlined)
# ---------------------------------------------------------------------------

def _varint(buf, i):
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf):
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt} at {i}")
        yield fnum, wt, v


def parse_xspace(buf):
    """-> list of planes: (name, metadata {id: name}, lines
    [(line_name, [(metadata_id, duration_ps)])])."""
    planes = []
    for fnum, wt, v in _fields(buf):
        if fnum == 1 and wt == 2:  # XSpace.planes
            name = ""
            meta = {}
            lines = []
            for pf, pw, pv in _fields(v):
                if pf == 2 and pw == 2:  # XPlane.name
                    name = pv.decode("utf-8", "replace")
                elif pf == 4 and pw == 2:  # XPlane.event_metadata (map)
                    mid, mname = None, ""
                    for mf, mw, mv in _fields(pv):
                        if mf == 1 and mw == 0:
                            mid = mv
                        elif mf == 2 and mw == 2:  # XEventMetadata
                            for ef, ew, ev in _fields(mv):
                                if ef == 2 and ew == 2:
                                    mname = ev.decode("utf-8", "replace")
                    if mid is not None:
                        meta[mid] = mname
                elif pf == 3 and pw == 2:  # XPlane.lines
                    lname = ""
                    events = []
                    for lf, lw, lv in _fields(v_iter_line := pv):
                        if lf == 2 and lw == 2:
                            lname = lv.decode("utf-8", "replace")
                        elif lf == 4 and lw == 2:  # XLine.events
                            mid = dur = 0
                            for ef, ew, ev in _fields(lv):
                                if ef == 1 and ew == 0:
                                    mid = ev
                                elif ef == 3 and ew == 0:
                                    dur = ev
                            events.append((mid, dur))
                    lines.append((lname, events))
            planes.append((name, meta, lines))
    return planes


def summarize(outdir, top=30):
    pbs = glob.glob(
        os.path.join(outdir, "**", "*.xplane.pb"), recursive=True
    ) + glob.glob(os.path.join(outdir, "**", "*.xplane.pb.gz"), recursive=True)
    if not pbs:
        print("NO xplane.pb produced -- trace unsupported on this platform")
        return False
    for pb in pbs:
        raw = open(pb, "rb").read()
        if pb.endswith(".gz"):
            raw = gzip.decompress(raw)
        for name, meta, lines in parse_xspace(raw):
            if "TPU" not in name and "device" not in name.lower():
                continue
            print(f"\n=== plane: {name} ===")
            for lname, events in lines:
                if not events:
                    continue
                agg = {}
                for mid, dur in events:
                    key = meta.get(mid, f"#{mid}")
                    t, c = agg.get(key, (0, 0))
                    agg[key] = (t + dur, c + 1)
                total = sum(t for t, _ in agg.values())
                print(f"--- line: {lname} (total {total/1e9:.3f} ms over "
                      f"{sum(c for _, c in agg.values())} events)")
                for key, (t, c) in sorted(
                    agg.items(), key=lambda kv: -kv[1][0]
                )[:top]:
                    print(f"{t/1e9:10.3f} ms  x{c:<5d} {key[:110]}")
    return True


# ---------------------------------------------------------------------------
# workload: the F=2688 single-shard query block from profile_stages.py
# ---------------------------------------------------------------------------

def _family_panel(n_genomes, rng):
    """bench.py's family/cross-family panel at a reduced genome count
    (identical budget statistics: biased row length, chunk density)."""
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    lengths = [1000000, 2000000, 3000000, 5000000]
    out = []
    prev_base = None
    for fam in range(-(-n_genomes // 4)):
        if fam % 2 == 1 and prev_base is not None:
            base = prev_base.copy()
            idx = rng.random(base.shape[0]) < 0.09
            base[idx] = rng.choice(alphabet, size=int(idx.sum()))
        else:
            base = rng.choice(alphabet, size=lengths[(fam // 2) % 4])
        prev_base = base
        for _ in range(min(4, n_genomes - len(out))):
            arr = base.copy()
            idx = rng.random(arr.shape[0]) < 0.03
            arr[idx] = rng.choice(alphabet, size=int(idx.sum()))
            out.append(arr.tobytes())
    return out


def build_fullfn():
    import jax
    import jax.numpy as jnp

    from pyfastani_tpu import Sketch, stats
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import ShardedSession, _query_block_impl

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_ava = int(os.environ.get("BENCH_AVA", "0"))
    if n_ava:
        # ava mode: family panel index; one full dispatch group of
        # queries (first genomes up to ~4096 fragments)
        refs = _family_panel(n_ava, rng)
        queries = []
        nf = 0
        for g in refs:
            if nf + len(g) // 3000 > 4096:
                break
            queries.append(g)
            nf += len(g) // 3000
    else:
        refs = [
            rng.choice(alphabet, size=REF_LEN).tobytes()
            for _ in range(N_REFS)
        ]
        queries = []
        for i in range(N_QUERIES):
            base = np.frombuffer(refs[i % N_REFS], dtype=np.uint8).copy()
            idx = rng.random(base.shape[0]) < 0.03
            base[idx] = rng.choice(alphabet, size=int(idx.sum()))
            queries.append(base.tobytes())

    sketch = Sketch()
    for i, r in enumerate(refs):
        sketch.add_genome(f"ref{i}", r)
    mapper = sketch.index()
    session = ShardedSession(mapper, make_mesh(1, 1))
    params, b, sidx = session.params, session.budgets, session.sidx
    l = params.min_read_length

    per_genome = [session._fragments([q]) for q in queries]
    F = sum(p[1] for p in per_genome)
    Fb = max(-(-F // 128) * 128, 128)
    frags = np.zeros((Fb, l + 4), dtype=np.uint8)
    frag_qg = np.zeros(Fb, dtype=np.int32)
    row = 0
    for qg, (blocks, _, _) in enumerate(per_genome):
        for block in blocks:
            n = block.shape[0]
            frags[row : row + n, :l] = block
            frag_qg[row : row + n] = qg
            row += n

    k, w = params.kmer_size, params.window_size
    tab = stats.min_hits_relaxed_table(l, k, params.percentage_identity)
    gate = stats.l2_gate_table(l, k, params.percentage_identity)
    ident2d = stats.identity_table(b["smax"], k)
    g_max = int(sidx.genome_lengths.shape[1])
    full_args = [jnp.asarray(a[0]) for a in (
        sidx.uniq_hash, sidx.row_start, sidx.row_len, sidx.post_gpos,
        sidx.mini_hash, sidx.mini_wpos, sidx.mini_seqid,
        sidx.mini_gpos, sidx.mini_prev, sidx.contig_offset,
        sidx.seq_to_genome)]
    thr = jnp.asarray(sidx.freq_threshold[0])
    hb = jnp.asarray(np.stack(
        [sidx.hash_bucket[0][:-1], sidx.hash_bucket[0][1:]], axis=-1
    ))
    static = dict(k=k, w=w, length=l, protein=False, l=l,
                  hmax=b["hmax"], ivmax=b["ivmax"], cmax=b["cmax"],
                  rmax=b["rmax"], t_chunks=b["t_chunks"], g_max=g_max,
                  bin_max=b["bin_max"], smax=b["smax"],
                  q_count=max(4, len(queries)),
                  bucket_steps=sidx.bucket_steps,
                  use_pallas=session._use_pallas,
                  m_values=tuple(sorted({int(max(int(v), 1))
                                         for v in tab[: b["smax"] + 1]})))
    gaux = (jnp.asarray(sidx.gpos_bucket[0]), sidx.gpos_shift, sidx.gpos_steps)
    fullfn = jax.jit(lambda fr, qg: _query_block_impl(
        fr, qg, *full_args, thr, hb, jnp.asarray(tab), jnp.asarray(gate),
        jnp.asarray(ident2d), gpos_aux=gaux, **static))
    dfrags = jax.device_put(jnp.asarray(frags))
    dqg = jax.device_put(jnp.asarray(frag_qg))
    return fullfn, dfrags, dqg, F


def main():
    import jax

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pf_trace"
    fullfn, dfrags, dqg, F = build_fullfn()
    print(f"F={F}; compiling/warming...", flush=True)
    out = fullfn(dfrags, dqg)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fullfn(dfrags, dqg)
    jax.block_until_ready(out)
    print(f"warm block: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    print("tracing...", flush=True)
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        out = fullfn(dfrags, dqg)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace done; parsing...", flush=True)
    summarize(outdir)


if __name__ == "__main__":
    main()
