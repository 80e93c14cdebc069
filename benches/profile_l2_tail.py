"""Bisect the query block's tail: winnow+L1 / +L2 / full (CGI).

The kernel-cut probe showed the Pallas kernel is ~free, so this splits
the remaining "L2+CGI" stage time between the XLA wrapper around the
kernel (chunk expansion, range searches, slab build, segment merges)
and the identity-gate + CGI reductions."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REFS = int(os.environ.get("BENCH_REFS", "10"))
REF_LEN = int(os.environ.get("BENCH_REF_LEN", "2000000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "4"))


def main():
    import jax
    import jax.numpy as jnp

    from pyfastani_tpu import Sketch, stats
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import (
        ShardedSession, _query_block_impl, _l2_interval_scan, _CH_SLAB,
    )
    from pyfastani_tpu.ops.fragments import _winnow_fragments_impl
    from pyfastani_tpu.ops.l1 import l1_candidates_device

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(alphabet, size=REF_LEN).tobytes() for _ in range(N_REFS)]
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
    params = session.params
    l = params.min_read_length
    b = session.budgets
    sidx = session.sidx
    k, w = params.kmer_size, params.window_size
    print(f"budgets {b} gpos_steps={sidx.gpos_steps}", flush=True)

    per_genome = [session._fragments([q]) for q in queries]
    F = max(-(-sum(p[1] for p in per_genome) // 128) * 128, 128)
    frags = np.zeros((F, l + 4), dtype=np.uint8)
    frag_qg = np.zeros(F, dtype=np.int32)
    row = 0
    for qg, (blocks, _, _) in enumerate(per_genome):
        for block in blocks:
            n = block.shape[0]
            frags[row : row + n, :l] = block
            frag_qg[row : row + n] = qg
            row += n

    A = {
        n: jnp.asarray(sidx.__dict__[n][0])
        for n in ("uniq_hash", "row_start", "row_len", "post_gpos",
                  "mini_hash", "mini_wpos", "mini_seqid",
                  "mini_gpos", "mini_prev", "contig_offset",
                  "seq_to_genome", "hash_bucket", "gpos_bucket")
    }
    A["hash_bucket"] = jnp.asarray(np.stack(
        [sidx.hash_bucket[0][:-1], sidx.hash_bucket[0][1:]], axis=-1
    ))
    thr = jnp.asarray(sidx.freq_threshold[0])
    tab = jnp.asarray(stats.min_hits_relaxed_table(l, k, params.percentage_identity))
    gate = jnp.asarray(stats.l2_gate_table(l, k, params.percentage_identity))
    ident2d = jnp.asarray(stats.identity_table(b["smax"], k))
    cmw = l - (k - 1)
    smax = b["smax"]
    kc = min(smax + 128, l)
    use_pallas = session._use_pallas
    gpos_aux = (A["gpos_bucket"], sidx.gpos_shift, sidx.gpos_steps)
    m_values = tuple(sorted({int(max(int(v), 1))
                             for v in np.asarray(tab)[: smax + 1]}))

    def iv_convert(iv_g0, iv_g1, iv_valid):
        C1 = A["contig_offset"].shape[0]
        g0f, g1f = iv_g0.reshape(-1), iv_g1.reshape(-1)
        iv_seq = jnp.clip(
            jnp.searchsorted(A["contig_offset"], g1f, side="right").astype(
                jnp.int32) - 1, 0, C1 - 2)
        base = A["contig_offset"][iv_seq]
        return iv_seq, jnp.maximum(g0f, base) - base, g1f - base

    def upto_l2(fr):
        _, _, q_sorted, s_sizes = _winnow_fragments_impl.__wrapped__(
            fr, k, w, l, False, kc
        )
        q_sorted = q_sorted[:, : min(smax, q_sorted.shape[1])]
        iv = l1_candidates_device.__wrapped__(
            q_sorted, s_sizes, A["uniq_hash"], A["row_start"], A["row_len"],
            A["post_gpos"], thr, tab, A["hash_bucket"],
            b["hmax"], b["ivmax"], l, sidx.bucket_steps, m_values,
        )
        iv_seq, iv_c0, iv_c1 = iv_convert(iv[0], iv[1], iv[2])
        iv_valid = iv[2]
        frag_of_iv = jnp.repeat(jnp.arange(F, dtype=jnp.int32), b["ivmax"])
        ch_max = -(-(F * b["t_chunks"]) // _CH_SLAB) * _CH_SLAB
        return _l2_interval_scan(
            q_sorted, s_sizes, frag_of_iv, iv_seq,
            iv_c0, iv_c1, iv_valid.reshape(-1),
            A["mini_hash"], A["mini_wpos"], A["mini_seqid"], A["mini_gpos"],
            A["mini_prev"], A["contig_offset"], cmw, b["cmax"], b["rmax"],
            ch_max, use_pallas, None, gpos_aux,
        )[:3]

    def pre_kernel(fr):
        """Everything the L2 scan computes BEFORE the pallas call."""
        from pyfastani_tpu.parallel.sharded import (
            _l2_kernel_rows, _bucketed_gpos_search,
        )
        from pyfastani_tpu.ops.l1 import _scan2

        _, _, q_sorted, s_sizes = _winnow_fragments_impl.__wrapped__(
            fr, k, w, l, False, kc
        )
        q_sorted = q_sorted[:, : min(smax, q_sorted.shape[1])]
        iv = l1_candidates_device.__wrapped__(
            q_sorted, s_sizes, A["uniq_hash"], A["row_start"], A["row_len"],
            A["post_gpos"], thr, tab, A["hash_bucket"],
            b["hmax"], b["ivmax"], l, sidx.bucket_steps, m_values,
        )
        iv_seq, iv_c0, iv_c1 = iv_convert(iv[0], iv[1], iv[2])
        iv_valid = iv[2].reshape(-1)
        frag_of_iv = jnp.repeat(jnp.arange(F, dtype=jnp.int32), b["ivmax"])
        ch_max = -(-(F * b["t_chunks"]) // _CH_SLAB) * _CH_SLAB
        cmax = b["cmax"]
        NI = iv_seq.shape[0]
        span = jnp.where(iv_valid, iv_c1 - iv_c0 + 1, 0)
        n_ch = (span + cmax - 1) // cmax
        ends = _scan2(jax.lax.cumsum, n_ch)
        total = ends[-1]
        starts = ends - n_ch
        j = jnp.arange(ch_max, dtype=jnp.int32)
        scat0 = jnp.where(n_ch > 0, jnp.minimum(starts, ch_max), ch_max)
        iv_of = jnp.zeros((ch_max + 1,), jnp.int32).at[scat0].max(
            jnp.arange(NI, dtype=jnp.int32)
        )
        iv_of = _scan2(jax.lax.cummax, iv_of[:ch_max])
        iv_of_c = jnp.clip(iv_of, 0, NI - 1)
        t = j - starts[iv_of_c]
        ch_c0 = iv_c0[iv_of_c] + t * cmax
        ch_len = jnp.clip(iv_c1[iv_of_c] - ch_c0 + 1, 0, cmax)
        ch_valid = j < total
        ch_seq = iv_seq[iv_of_c]
        seq_c = jnp.clip(ch_seq, 0, A["contig_offset"].shape[0] - 2)
        ch_base = A["contig_offset"][seq_c]
        R = _l2_kernel_rows(b["rmax"])
        key_lo = ch_base + ch_c0
        key_hi = ch_base + jnp.minimum(ch_c0 + ch_len - 1 + cmw, 2**30)
        gb, gsh, gst = gpos_aux
        lo = _bucketed_gpos_search(A["mini_gpos"], key_lo, gb, gsh, gst)
        hi = _bucketed_gpos_search(A["mini_gpos"], key_hi, gb, gsh, gst)
        cof_idx = jnp.searchsorted(
            A["mini_gpos"], A["contig_offset"]
        ).astype(jnp.int32)
        lo = jnp.maximum(lo, cof_idx[seq_c])
        hi = jnp.minimum(hi, cof_idx[seq_c + 1])
        rlen = jnp.where(ch_valid, jnp.maximum(hi - lo, 0), 0)
        return lo, rlen, ch_c0, ch_len, iv_of_c

    g_max = int(sidx.genome_lengths.shape[1])

    def full(fr, qg):
        return _query_block_impl(
            fr, qg, A["uniq_hash"], A["row_start"], A["row_len"],
            A["post_seqid"], A["post_wpos"], A["mini_hash"], A["mini_wpos"],
            A["mini_seqid"], A["mini_gpos"], A["mini_prev"],
            A["contig_offset"], A["seq_to_genome"], thr, A["hash_bucket"],
            tab, gate, ident2d, k, w, l, False, l,
            b["hmax"], b["ivmax"], b["cmax"], b["rmax"], b["t_chunks"],
            g_max, b["bin_max"], smax, 4, sidx.bucket_steps, use_pallas,
            None, gpos_aux,
        )

    dfr = jax.device_put(jnp.asarray(frags))
    dqg = jax.device_put(jnp.asarray(frag_qg))

    def bench(name, f, *a):
        jf = jax.jit(f)
        out = jf(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = jf(*a)
            jax.block_until_ready(out)
        print(f"{name:12s} {(time.time()-t0)/3*1e3:8.1f} ms", flush=True)

    bench("pre-kernel", pre_kernel, dfr)
    bench("win+L1+L2", upto_l2, dfr)
    bench("full block", full, dfr, dqg)


if __name__ == "__main__":
    main()
