"""Deduplication operators for document corpora.

Scale notes (100 TB corpus):
  * exact dedup is one hash-groupBy — map-side partial agg collapses dupes
    before the shuffle, so shuffle bytes ~ distinct count;
  * n-gram Jaccard is the EXACT pairwise path: shingle-explode + equi-join on
    the shingle. Quadratic in bucket co-membership — use only after LSH
    candidate pruning at scale (compose: lsh_candidate_pairs -> semi-join ->
    ngram_jaccard_pairs on the candidates);
  * MinHash+LSH is the scale path: signatures are one explode + groupBy per
    doc (linear), banding is a groupBy on (band, signature) — no pairwise
    work until candidates are emitted. Band width r=4 / k=32 gives the usual
    s-curve around J~0.6;
  * SimHash is linear: one pass per doc, near-dup = hamming distance on a
    64-bit int (cheap bucketed self-join on rotated prefixes at scale).

``use_portable_hash=True`` makes every hash reproducible in ANSI SQL (the
driver's DuckDB oracle); production would flip to xxhash64 (hashing.fast_hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from openlogreplicator_spark.functions.hashing import (
    P, fast_hash, minhash_proj, portable_hash,
)


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup: lower, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.
    Returns (keep_id, n_dupes) — the smallest doc id kept per group."""
    h = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    return (
        docs.select(F.col(id_col), h.alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
        .select("keep_id", "n_dupes")
    )


def word_shingles(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle string)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold_pct: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (doc_a < doc_b).

    Output: (doc_a, doc_b, inter_cnt, union_cnt) for pairs with
    100*inter >= threshold_pct*union — integer arithmetic only, so the SQL
    oracle matches bit-for-bit.
    """
    sh = word_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("union_cnt", F.col("na") + F.col("nb") - F.col("inter_cnt"))
        .where(F.lit(100) * F.col("inter_cnt") >= F.lit(threshold_pct) * F.col("union_cnt"))
        .select("doc_a", "doc_b", "inter_cnt", "union_cnt")
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    use_portable_hash: bool = True,
) -> DataFrame:
    """MinHash signature rows: (id, j, minhash_j) for j in [0, k)."""
    hash_fn = portable_hash if use_portable_hash else fast_hash
    sh = word_shingles(docs, id_col, text_col, n)
    hashed = sh.select(
        F.col(id_col),
        (hash_fn(F.col("shingle")) % P).alias("h"),
    )
    projected = hashed.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    minhash_proj(F.col("h"), j).alias("v"),
                ),
            )
        ).alias("p"),
    ).select(F.col(id_col), F.col("p.j").alias("j"), F.col("p.v").alias("v"))
    return projected.groupBy(id_col, "j").agg(F.min("v").alias("minhash"))


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 32,
    band_rows: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    use_portable_hash: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing >= 1 band signature.

    Banding: k minhashes split into k/band_rows bands; band signature is the
    '-'-joined values in j order. Pairs emitted once (doc_a < doc_b) with
    n_bands = number of colliding bands.
    """
    sig = minhash_signatures(docs, k, id_col, text_col, n, use_portable_hash)
    bands = (
        sig.withColumn("band", F.floor(F.col("j") / band_rows).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                "-", F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("j"), F.col("minhash")))
                    ),
                    lambda s: s.getField("minhash").cast("string"),
                )
            ).alias("sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.sig") == F.col("b.sig")))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash(
    docs: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_portable_hash: bool = True,
) -> DataFrame:
    """Per-doc SimHash over word tokens (all occurrences, not distinct).

    bit_j(sig) = sign of sum over tokens of (+1 if bit_j(hash(token)) else -1);
    returned as one integer (id, simhash). Integer-exact, oracle-matchable.
    """
    hash_fn = portable_hash if use_portable_hash else fast_hash
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    )
    hashed = toks.select(F.col(id_col), (hash_fn(F.col("tok")) % P).alias("h"))
    # bits unrolled in Python (shift amounts must be literals); stays one
    # explode + two aggregates regardless of `bits`
    per_bit = hashed.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
                .cast("long").alias("s"),
            )
            for j in range(bits)
        ])).alias("p"),
    ).select(F.col(id_col), F.col("p.j").alias("j"), F.col("p.s").alias("s"))
    bit_sums = per_bit.groupBy(id_col, "j").agg(F.sum("s").alias("bsum"))
    weight = F.element_at(
        F.array(*[F.lit(1 << j).cast("long") for j in range(bits)]),
        F.col("j") + 1,
    )
    return bit_sums.groupBy(id_col).agg(
        F.sum(F.when(F.col("bsum") > 0, weight).otherwise(F.lit(0)))
        .alias("simhash")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    bits: int = 32,
    radius: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_portable_hash: bool = True,
) -> DataFrame:
    """SimHash near-duplicate pairs at a fixed Hamming radius via the
    banded-prefix self-join (the scale path promised in the module notes).

    Completeness by pigeonhole: with ``radius < bands``, any pair within
    ``radius`` differing bits leaves at least one of the ``bands`` equal-width
    bit bands untouched — so the equi-join on (band_idx, band_value) finds
    every qualifying pair without an all-pairs comparison. Candidates are
    then verified exactly with popcount(xor).

    Scale: the join is bucketed by band value (shuffle ~ docs x bands rows of
    3 ints), never quadratic; a degenerate corpus where one band value is hot
    (e.g. boilerplate-heavy crawl data) re-salts by pairing band_value with a
    coarse length bucket — not needed at driver scale.

    Output: (doc_a, doc_b, hamming), doc_a < doc_b, hamming <= radius.
    """
    if radius >= bands:
        raise ValueError("completeness requires radius < bands")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash(docs, bits, id_col, text_col, use_portable_hash)
    # unrolled band extraction (shift amounts must be literals)
    banded = sig.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for b in range(bands)
        ])).alias("p"),
    ).select(F.col(id_col), F.col("simhash"),
             F.col("p.band").alias("band"), F.col("p.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv")))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= radius)
    )
    # a pair may collide in several bands — emit once
    return cand.distinct()


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold_pct: int = 80,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (doc_a < doc_b) at
    cos >= threshold_pct/100, decided in INTEGER arithmetic so the SQL
    oracle matches bit-for-bit:

        cos(a,b) >= t  <=>  dot > 0  AND  100^2*dot^2 >= (100t)^2*|a|^2*|b|^2

    over floor(x*100)-quantized vectors — no sqrt, no floats. Quantization
    here is x100 (NOT the x1000 the dot/IVF ops use) because the comparison
    squares the dot: 10^4*dot^2 <= 2^63 requires |dot| <= 3.0e7, and at
    64 dims |dot| <= 64*(100|x|)^2, so the safe component bound is
    |x| <= ~6.9 (x1000 would overflow int64 at |x| ~ 0.7 — Spark wraps
    silently with ANSI off, DuckDB errors; both wrong). Coarser quantization
    only moves the threshold by <1% on unit-norm-ish vectors.

    Scale: this is the EXACT all-pairs verifier — quadratic, like
    ngram_jaccard_pairs. At corpus scale compose with
    ``embedding_neardup_lsh_candidates`` (sign-LSH banding) and verify only
    the candidates; this function then runs on the candidate join, not the
    full cross product.
    """
    from openlogreplicator_spark.functions.similarity import (
        _dot_int, _quantize,
    )

    t2 = threshold_pct * threshold_pct
    v = emb.select(
        F.col(id_col).alias("vid"),
        _quantize(F.col(vec_col), scale=100).alias("qv"),
    ).withColumn("n2", _dot_int(F.col("qv"), F.col("qv")))
    a, b = v.alias("a"), v.alias("b")
    dot = _dot_int(F.col("a.qv"), F.col("b.qv"))
    pairs = (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("doc_a"),
            F.col("b.vid").alias("doc_b"),
            dot.alias("dot"),
            F.col("a.n2").alias("n2a"),
            F.col("b.n2").alias("n2b"),
        )
        .where(
            (F.col("dot") > 0)
            & (F.lit(10000) * F.col("dot") * F.col("dot")
               >= F.lit(t2) * F.col("n2a") * F.col("n2b"))
        )
    )
    return pairs.select("doc_a", "doc_b", "dot")


def embedding_neardup_lsh_candidates(
    emb: DataFrame,
    n_planes: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Sign-LSH candidate pairs for embedding near-dup — the scale path.

    Deterministic pseudo-random hyperplanes (sign pattern from integer
    arithmetic over (plane, dim), no RNG): signature bit h = sign of the
    projection onto plane h. Signatures band into n_planes/band_bits bands;
    docs sharing any band value become candidates (cosine-similar vectors
    agree on most sign bits, so near-dups collide with high probability).
    Output: (doc_a, doc_b) candidates for exact verification.
    """
    from openlogreplicator_spark.functions.similarity import (
        _dot_int, _quantize,
    )

    if n_planes % band_bits:
        raise ValueError("band_bits must divide n_planes")
    v = emb.select(
        F.col(id_col).alias("vid"), _quantize(F.col(vec_col)).alias("qv")
    )
    if dims is None:
        # fit-time probe: one-row driver action to read the corpus vector
        # length (analogous to fit_ivf_cells materializing centroids). The
        # planes are a pure function of (plane, dim), so a caller at scale
        # can also pass dims explicitly and skip the probe.
        row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None:
            raise ValueError("cannot infer dims from an empty corpus")
        dims = int(row["d"])
    # plane h, dim d sign: deterministic +-1 pattern
    planes = [
        F.array(*[
            F.lit(1 if ((h * 31 + d * 17) % 7) % 2 == 0 else -1).cast("long")
            for d in range(dims)
        ])
        for h in range(n_planes)
    ]
    bits = [ (_dot_int(F.col("qv"), p) >= 0).cast("long") for p in planes ]
    n_bands = n_planes // band_bits
    band_vals = []
    for bnd in range(n_bands):
        val = F.lit(0).cast("long")
        for i in range(band_bits):
            val = val * 2 + bits[bnd * band_bits + i]
        band_vals.append(F.struct(F.lit(bnd).alias("band"), val.alias("bv")))
    banded = v.select(
        "vid", F.explode(F.array(*band_vals)).alias("p")
    ).select("vid", F.col("p.band").alias("band"), F.col("p.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv")))
        .where(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("doc_a"), F.col("b.vid").alias("doc_b"))
        .distinct()
    )


def neardup_clusters(
    pairs: DataFrame, max_iter: int = 25, shortcut: bool = True
) -> DataFrame:
    """Connected components over near-dup candidate pairs -> duplicate
    clusters: every doc that appears in a pair gets the component's MIN
    doc id as ``cluster_id`` (the canonical keeper in a dedup pipeline is
    then ``doc_id == cluster_id``).

    Algorithm: hash-min label propagation with POINTER-JUMP shortcutting
    (Shiloach-Vishkin style). Labels start as the node's own id; each round
    every node takes the min of its own and its neighbors' labels, then
    jumps through its label's label (``l(u) <- min(l(u), l(l(u)))`` — valid
    because every label is itself a node of the same component, so the jump
    never crosses components and only ever lowers). Plain hash-min needs
    diameter rounds and SILENTLY mislabels any component deeper than
    ``max_iter``; shortcutting contracts chains geometrically, converging
    in O(log diameter) rounds (pinned by
    test_cluster_chain_converges_with_shortcut: a 300-chain labels
    correctly in <= 12 rounds where pure hash-min needs 300). Near-dup
    components are usually dense and shallow anyway — the jump is one
    extra self-join on the (small) label table per round, cheap insurance
    against boilerplate-heavy corpora that chain.

    Convergence: stop when no label changed (the shared fixpoint of both
    steps is the per-component min). Each round shuffles the edge list
    once and the label table twice; the convergence check is a bounded
    count() action per round.

    Input: (doc_a, doc_b) pairs from any candidate generator
    (simhash_neardup_pairs, lsh_candidate_pairs, sign-LSH). Output:
    (doc_id, cluster_id), one row per distinct doc in ``pairs``.

    Lineage: each round MUST truncate the plan, not just cache the data —
    ``persist`` alone leaves a logical plan that references the previous
    round's labels twice, doubling the tree per round (exponential plan =
    driver OOM long before any executor struggles). ``localCheckpoint``
    (eager) cuts it; a cluster deployment would use reliable
    ``checkpoint()`` for executor-loss tolerance.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()  # candidate generation runs ONCE, not per round
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        old = labels.withColumnRenamed("label", "old_label")
        new = old.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("old_label"),
                F.coalesce(F.col("nbr_min"), F.col("old_label")),
            ).alias("label"),
            F.col("old_label"),
        )
        if shortcut:
            # pointer jump: look up the label's own label and take the min.
            # Every label IS a node (labels only ever take node-id values),
            # so the inner join hits every row.
            lmap = new.select(
                F.col("node").alias("_ln"), F.col("label").alias("_ll")
            )
            new = new.join(
                lmap, new.label == lmap._ln, "left"
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
                ).alias("label"),
                "old_label",
            )
        new = new.localCheckpoint()
        changed = new.where(F.col("label") < F.col("old_label")).count()
        labels = new.select("node", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def simhash_neardup_incremental(
    corpus: DataFrame,
    delta: DataFrame,
    bits: int = 32,
    radius: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_portable_hash: bool = True,
) -> DataFrame:
    """CDC-incremental near-dup: pairs involving AT LEAST ONE new document.

    The ingest-time composition: when a CDC batch lands ``delta`` new
    documents into a corpus already deduplicated, re-running the full
    self-join repays O(|corpus| x bands) shuffle for pairs that cannot have
    changed. This variant joins only delta's band rows against the union's
    band rows, so cost scales with the BATCH, not the corpus:
    shuffle ~ |delta| x bands probe rows against a bucketed build side (AQE
    broadcasts the delta side when it fits). In production the corpus band
    table is the persisted signature index the engine maintains as a side
    table of the lake MERGE (same bucketed layout, reference analog: OLR's
    consumers keep their own derived indexes downstream); here it is
    recomputed because the driver tables are read-only parquet.

    Completeness: identical pigeonhole argument to simhash_neardup_pairs
    (radius < bands), restricted to pairs touching delta — old x old pairs
    are by construction already known.

    Output: (doc_a, doc_b, hamming), doc_a < doc_b, at least one side new.
    """
    if radius >= bands:
        raise ValueError("completeness requires radius < bands")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1

    def _banded(docs: DataFrame) -> DataFrame:
        sig = simhash(docs, bits, id_col, text_col, use_portable_hash)
        return sig.select(
            F.col(id_col), F.col("simhash"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit(mask)).alias("bv"),
                )
                for b in range(bands)
            ])).alias("p"),
        ).select(F.col(id_col), F.col("simhash"),
                 F.col("p.band").alias("band"), F.col("p.bv").alias("bv"))

    new_b = _banded(delta)
    all_b = _banded(corpus).unionByName(new_b)
    n, a = new_b.alias("n"), all_b.alias("a")
    cand = (
        n.join(a, (F.col("n.band") == F.col("a.band"))
               & (F.col("n.bv") == F.col("a.bv")))
        .where(F.col(f"n.{id_col}") != F.col(f"a.{id_col}"))
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_b"),
            F.bit_count(
                F.col("n.simhash").bitwiseXOR(F.col("a.simhash"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= radius)
    )
    # a pair collides in several bands, and a delta x delta pair is found
    # from both ends — canonical (doc_a < doc_b) + distinct emits it once
    return cand.distinct()
