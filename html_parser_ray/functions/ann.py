"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is ray.put once and
every map_batches task does one numpy matmul against its Arrow batch
(zero-copy → ndarray), emitting per-batch partial top-k; a final small
sort-limit merges partials. Scale path: IVF — coarse k-means-style
centroids (deterministic seeded init), probe the nearest cells only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(matrix: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return matrix / norms


def list_col_to_matrix(col, dtype=np.float32) -> np.ndarray:
    """Arrow list<float> column → (n, dim) ndarray WITHOUT the per-row
    to_pylist() round-trip: one flat buffer view + reshape. Rows must all
    have the same length (embedding columns do); raises on ragged input
    rather than silently mis-slicing."""
    if hasattr(col, "combine_chunks"):          # ChunkedArray
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    values = col.flatten().to_numpy(zero_copy_only=False)
    if values.size % n:
        raise ValueError(
            f"ragged list column: {values.size} values / {n} rows")
    dim = values.size // n
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    if not (np.diff(offsets) == dim).all():
        raise ValueError("ragged list column: row lengths differ")
    return values.reshape(n, dim).astype(dtype, copy=False)


def deterministic_query_vector(dim: int, seed: int = 7) -> list[float]:
    """Seeded pseudo-random unit query (no wall-clock / global RNG)."""
    state = seed
    out = []
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        out.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    arr = np.asarray(out, dtype=np.float32)
    arr /= np.linalg.norm(arr)
    return [float(x) for x in arr]


def brute_force_topk(ds, query: list[float], k: int = 10):
    """embeddings → Dataset[(vec_id, cosine_bp)] top-k by cosine.

    Per-batch partial top-k inside map_batches (numpy matmul), then a single
    tiny sort().limit(k) — the shuffle moves at most k rows per block.
    """
    import ray
    q = np.asarray(query, dtype=np.float32)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        vecs = list_col_to_matrix(batch.column("embedding"))
        sims = _unit(vecs) @ qv
        take = min(k, len(ids))
        idx = np.argpartition(-sims, take - 1)[:take] if take < len(ids) else np.arange(len(ids))
        return pa.table({
            "vec_id": pa.array(ids[idx], pa.int64()),
            "cosine_bp": pa.array(
                [int(round(float(s) * 10_000)) for s in sims[idx]], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .sort(["cosine_bp", "vec_id"], descending=[True, False])
            .limit(k))


def ivf_centroids(dim: int, n_cells: int = 16) -> np.ndarray:
    """Deterministic coarse centroids: unit vectors from the seeded
    generator (stable across runs, so a persisted cell column stays valid
    for every future query)."""
    return np.stack([
        np.asarray(deterministic_query_vector(dim, seed=1000 + c),
                   dtype=np.float32)
        for c in range(n_cells)])


def ivf_train(ds, *, dim: int, n_cells: int = 16, sample_size: int = 8192,
              iters: int = 10, seed: int = 31,
              sample_rate_permille: int = 500) -> np.ndarray:
    """Train coarse IVF centroids with spherical k-means on a bounded,
    deterministic sample (hash-filtered on vec_id — uniform regardless of
    block order, unlike limit()-style head sampling).

    Scale shape: ONE pruned pass over (vec_id, embedding) collects at most
    ``sample_size`` vectors to the driver (sample_size × dim × 4 bytes —
    ~2 MB at the defaults); Lloyd iterations run on that sample in numpy.
    Standard IVF practice trains on ~256 vectors per cell, so the sample —
    not the corpus — bounds training cost at 100 TB. Empty cells are
    re-seeded from the least-covered points. Returns unit centroids; pass
    them to ivf_assign / ivf_search. Assignments persisted with trained
    centroids stay valid for every future query as long as the same
    centroids (same seed + corpus sample) are used to probe.

    ``sample_rate_permille``: hash-filter pass rate (‰). The stream stops
    as soon as ``sample_size`` rows pass, so the default 500‰ is fine for
    small tables; on a huge corpus set it near 1000×sample_size/n so the
    sample draws from all shards instead of the first few blocks."""
    import ray

    rate = np.uint64(sample_rate_permille)

    def hash_sample(batch: pa.Table) -> pa.Table:
        ids = (batch.column("vec_id").to_numpy(zero_copy_only=False)
               .astype(np.uint64))
        keep = (ids * np.uint64(2654435761)) % np.uint64(1000) < rate
        return batch.filter(pa.array(keep))

    sample_tbl = pa.concat_tables(
        list(ds.map_batches(hash_sample, batch_format="pyarrow")
             .limit(sample_size).iter_batches(batch_format="pyarrow")))
    vecs = _unit(list_col_to_matrix(sample_tbl.column("embedding")))
    n = len(vecs)
    if n == 0:
        return ivf_centroids(dim, n_cells)
    # seeded init: deterministic distinct sample positions
    state = np.uint64(seed)
    picks = []
    with np.errstate(over="ignore"):   # uint64 wraparound IS the LCG
        while len(picks) < min(n_cells, n):
            state = (state * np.uint64(6364136223846793005)
                     + np.uint64(1442695040888963407))
            idx = int(state >> np.uint64(33)) % n
            if idx not in picks:
                picks.append(idx)
    cents = vecs[picks].copy()
    if len(cents) < n_cells:   # tiny sample: pad with deterministic units
        cents = np.concatenate(
            [cents, ivf_centroids(dim, n_cells)[len(cents):]])
    for _ in range(iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        for c in range(n_cells):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:
                # re-seed an empty cell at the point farthest from its
                # current centroid (classic empty-cluster repair)
                worst = int(np.argmin(np.max(vecs @ cents.T, axis=1)))
                cents[c] = vecs[worst]
        cents = _unit(cents)
    return cents.astype(np.float32)


def ivf_assign(ds, *, dim: int, n_cells: int = 16,
               centroids: np.ndarray | None = None):
    """INGEST-time stage: append a persisted ``cell`` column (nearest
    coarse centroid per vector). Run once when the embedding table is
    written — every subsequent ``ivf_search`` filters on the stored
    column instead of re-assigning the whole corpus per query (the r01
    per-query-reassignment fix). Centroids are broadcast via ray.put,
    never re-shipped per batch. Pass ``centroids`` from ``ivf_train`` for
    balanced cells; the deterministic seeded fallback needs no training
    pass but gives data-blind cell boundaries."""
    import ray
    cents_ref = ray.put(centroids if centroids is not None
                        else ivf_centroids(dim, n_cells))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cents_ref)
        vecs = _unit(list_col_to_matrix(batch.column("embedding")))
        cells = np.argmax(vecs @ cent.T, axis=1)
        return batch.append_column("cell", pa.array(cells, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_search(assigned_ds, query: list[float], k: int = 10,
               n_cells: int = 16, n_probe: int = 4,
               centroids: np.ndarray | None = None):
    """Search a dataset that already carries the persisted ``cell``
    column: prune to the ``n_probe`` cells nearest the query (cheap
    vectorized filter on the stored int column), exact cosine within the
    probed cells, per-batch partial top-k, tiny final sort-limit. Exact
    when n_probe == n_cells. ``centroids`` must be the same array the
    ``cell`` column was assigned with."""
    import ray
    q = np.asarray(query, dtype=np.float32)
    q = q / np.linalg.norm(q)
    cents = (centroids if centroids is not None
             else ivf_centroids(len(query), n_cells))
    probe_cells = np.sort(np.argsort(-(cents @ q))[:n_probe]).astype(np.int32)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        mask = np.isin(cells, probe_cells)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine_bp": pa.array([], pa.int64())})
        vecs = _unit(list_col_to_matrix(
            batch.column("embedding").filter(pa.array(mask))))
        sims = vecs @ qv
        take = min(k, len(ids))
        idx = (np.argpartition(-sims, take - 1)[:take]
               if take < len(ids) else np.arange(len(ids)))
        return pa.table({
            "vec_id": pa.array(ids[idx], pa.int64()),
            "cosine_bp": pa.array(
                [int(round(float(s) * 10_000)) for s in sims[idx]],
                pa.int64()),
        })

    return (assigned_ds.map_batches(partial, batch_format="pyarrow")
            .sort(["cosine_bp", "vec_id"], descending=[True, False])
            .limit(k))


def ivf_topk(ds, query: list[float], k: int = 10, n_cells: int = 16,
             n_probe: int = 4, train: bool = False):
    """Convenience composition (train →) assign → search for a table that
    was not written with a cell column. Production path: ``ivf_train`` +
    ``ivf_assign`` once at ingest (cell column written to parquet),
    ``ivf_search`` per query."""
    cents = (ivf_train(ds, dim=len(query), n_cells=n_cells)
             if train else None)
    assigned = ivf_assign(ds, dim=len(query), n_cells=n_cells,
                          centroids=cents)
    return ivf_search(assigned, query, k=k, n_cells=n_cells,
                      n_probe=n_probe, centroids=cents)


# ---------------------------------------------------------------------------
# k-NN self-join (all-vectors top-k neighbors)


def quantize_matrix(mat: np.ndarray, scale: int = 10_000) -> np.ndarray:
    """float32 matrix → int64 ``round(float64(x)·scale)``. Pinned
    convention: the multiply happens in FLOAT64 (DuckDB must CAST x to
    DOUBLE before `* scale` — the float32 product can land exactly on
    .5 and round away; verified divergent on the test tables without
    the cast, 0/124750 pair mismatches with it)."""
    return np.round(mat.astype(np.float64) * scale).astype(np.int64)


def knn_join(ds, *, k: int = 5, n_cells: int = 16, n_probe: int = 16,
             centroids: np.ndarray | None = None, dim: int | None = None,
             num_partitions: int = 64, scale: int = 10_000):
    """embeddings → Dataset[(vec_id, neighbor_id, dot_q)]: every vector's
    top-k neighbors by QUANTIZED inner product — the all-pairs similarity
    step behind near-dup mining and diversity analysis, as an IVF-bucketed
    co-group join (never an O(n²) cross product).

    Similarity is ``dot_q = Σ round(a_i·1e4)·round(b_i·1e4)`` — integer-
    exact on every engine (|dot_q| < dim·(scale·max|x|)², asserted within
    int64 composite-key range), so results value-oracle without float
    rounding hazards; for roughly-unit embeddings the dot ranking IS the
    cosine ranking. Ties break to the smaller neighbor_id (= SQL
    ``row_number() OVER (... ORDER BY dot_q DESC, neighbor_id)``).

    Scale shape (100 TB): each vector lands in ONE coarse cell (index
    side) and explodes to its ``n_probe`` nearest cells (query side);
    one ``groupby(cell)`` co-locates both and ONE vectorized matmul per
    CELL emits ≤k candidate rows per (query, probed cell). The merge is
    a hash-partitioned segment reduction (one Python call per PARTITION,
    not per query — dedup.py's star-operation pattern). Shuffle volume:
    (1 + n_probe) copies of the embedding column plus k·n_probe 24-byte
    candidate rows per vector — linear in n, never quadratic. Exact when
    ``n_probe == n_cells``; recall-bounded otherwise (pytest-measured).
    """
    import ray

    if centroids is None:
        if dim is None:
            first = ds.take(1)
            dim = len(first[0]["embedding"])
        centroids = ivf_centroids(dim, n_cells)
    cents_ref = ray.put(centroids)

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": batch.column("embedding"),
                             "is_query": pa.array([], pa.int8())})
        cents = ray.get(cents_ref)
        vecs = _unit(list_col_to_matrix(batch.column("embedding")))
        aff = vecs @ cents.T
        own = np.argmax(aff, axis=1).astype(np.int32)
        n_p = min(n_probe, len(cents))
        # n_probe nearest cells per query row (own cell is its top-1,
        # so every vector probes its own cell — self handled by mask)
        probes = np.argpartition(-aff, n_p - 1, axis=1)[:, :n_p]
        idx_tbl = pa.table({
            "cell": pa.array(own, pa.int32()),
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "embedding": batch.column("embedding"),
            "is_query": pa.array(np.zeros(batch.num_rows, np.int8)),
        })
        rep = np.repeat(np.arange(batch.num_rows), n_p)
        q_tbl = pa.table({
            "cell": pa.array(probes.ravel().astype(np.int32), pa.int32()),
            "vec_id": batch.column("vec_id").cast(pa.int64()).take(
                pa.array(rep)),
            "embedding": batch.column("embedding").take(pa.array(rep)),
            "is_query": pa.array(np.ones(len(rep), np.int8)),
        })
        return pa.concat_tables([idx_tbl, q_tbl])

    def cell_knn(group: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dot_q": pa.array([], pa.int64())})
        isq = group.column("is_query").to_numpy(zero_copy_only=False)
        qi, ii = np.flatnonzero(isq == 1), np.flatnonzero(isq == 0)
        if len(qi) == 0 or len(ii) == 0:
            return empty
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        qm = quantize_matrix(list_col_to_matrix(group.column("embedding")),
                             scale)
        # headroom check BEFORE the int64 matmul (a wrapped dot can look
        # small and slip past a post-hoc check): bound the dot by
        # dim·max|q|·max|i|, in Python ints
        m_max = int(np.abs(qm).max(initial=0))
        n_idx_pre = len(ii)
        assert m_max * m_max * qm.shape[1] * (n_idx_pre + 1) < (1 << 62), \
            "dot_q could exceed int64 composite-key headroom; lower scale"
        S = qm[qi] @ qm[ii].T
        qids, iids = ids[qi], ids[ii]
        # composite key: (-dot) in the high bits, neighbor POSITION in
        # the low 32 — one argpartition instead of per-row lexsorts.
        # Positions are pre-sorted by neighbor id so position order ==
        # id order within equal dots.
        iorder = np.argsort(iids)
        S = S[:, iorder]
        iids = iids[iorder]
        n_idx = S.shape[1]
        key = -S.astype(np.int64) * np.int64(n_idx + 1) \
            + np.arange(n_idx, dtype=np.int64)
        # self-pairs out of contention
        key[qids[:, None] == iids[None, :]] = np.iinfo(np.int64).max
        take = min(k, S.shape[1])
        top = np.argpartition(key, take - 1, axis=1)[:, :take]
        tkey = np.take_along_axis(key, top, axis=1)
        srt = np.argsort(tkey, axis=1)
        top = np.take_along_axis(top, srt, axis=1)
        tkey = np.take_along_axis(tkey, srt, axis=1)
        valid = tkey != np.iinfo(np.int64).max
        rows = np.repeat(qids, take)[valid.ravel()]
        nbrs = iids[top.ravel()][valid.ravel()]
        dots = np.take_along_axis(S, top, axis=1).ravel()[valid.ravel()]
        return pa.table({"vec_id": pa.array(rows, pa.int64()),
                         "neighbor_id": pa.array(nbrs, pa.int64()),
                         "dot_q": pa.array(dots.astype(np.int64),
                                           pa.int64())})

    def add_part(batch: pa.Table) -> pa.Table:
        v = (batch.column("vec_id").to_numpy(zero_copy_only=False)
             .astype(np.uint64))
        part = ((v * np.uint64(2654435761)) % np.uint64(num_partitions))
        return batch.append_column(
            "part", pa.array(part.astype(np.int64), pa.int64()))

    def merge_part(group: pa.Table) -> pa.Table:
        """ONE vectorized segment reduction per partition: global top-k
        per query from its ≤ k·n_probe candidate rows."""
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        dot = group.column("dot_q").to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -dot, vid))
        v_s = vid[order]
        new_seg = np.ones(len(order), dtype=bool)
        new_seg[1:] = v_s[1:] != v_s[:-1]
        seg_start = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        pos = np.arange(len(order)) - seg_start[seg_id]
        keep = order[pos < k]
        return pa.table({"vec_id": pa.array(vid[keep], pa.int64()),
                         "neighbor_id": pa.array(nid[keep], pa.int64()),
                         "dot_q": pa.array(dot[keep], pa.int64())})

    candidates = (ds.map_batches(explode, batch_format="pyarrow")
                  .groupby("cell")
                  .map_groups(cell_knn, batch_format="pyarrow"))
    return (candidates.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(merge_part, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# grouped embedding centroids (integer-exact vector aggregate)


def grouped_vector_sum(ds, *, group_col: str = "label",
                       vec_col: str = "embedding", scale: int = 10_000):
    """Dataset[..., group, vec] → Dataset(group, dim, sum_q, n_vecs):
    per-group QUANTIZED embedding sums — the mergeable form of a group
    centroid (mean = sum_q / (n_vecs·scale), a driver-side finish), used
    for cluster profiling, per-language embedding drift, and IVF
    re-training from assignments.

    Integer-exact cross-engine: each component is round(float64(x)·1e4)
    (quantize_matrix's pinned convention) and sums are int64 (safe while
    n·scale·max|x| < 2⁶³ — 10¹⁴ vectors at unit scale). Scale shape: per
    batch, ONE np.add.reduceat per sorted group segment collapses rows
    to groups-in-batch × dim partial rows; the global combine is a
    ``groupby([group, dim]).sum`` over those — the vectors themselves
    never shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        groups = (batch.column(group_col).to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        q = quantize_matrix(list_col_to_matrix(batch.column(vec_col)),
                            scale)
        order = np.argsort(groups, kind="stable")
        g_s, q_s = groups[order], q[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = g_s[1:] != g_s[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(q_s, starts, axis=0)     # (n_groups, dim)
        counts = np.diff(np.append(starts, len(order)))
        n_g, dim = sums.shape
        return pa.table({
            group_col: pa.array(np.repeat(g_s[starts], dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n_g),
                            pa.int64()),
            "sum_q": pa.array(sums.ravel().astype(np.int64), pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, dim).astype(np.int64),
                               pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "dim"])
            .aggregate(Sum("sum_q", alias_name="sum_q"),
                       Sum("n_vecs", alias_name="n_vecs")))
