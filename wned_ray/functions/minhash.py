"""Character-shingle MinHash + LSH band keys (J2 / blocking tier).

The reference's fuzzy alias lookup is a Lucene char-ngram index queried
with a 200-hit budget and three re-rankers
(``…/common/indexing/AliasLuceneIndex.java:65-75,247-300``). The scalable
Ray-Data-native analog is MinHash-LSH over character k-shingles: mentions
sharing an LSH band hash land in the same block; the scorer then verifies
with exact string-similarity kernels (the re-rank step).

Everything here is vectorized over a whole Arrow batch:

1. all strings are concatenated into one byte buffer (numpy uint8 view);
2. k-gram hashes are polynomial rolling hashes computed with k shifted
   multiplies over the whole buffer (no per-string loop);
3. per-permutation minima are taken with ``np.minimum.reduceat`` over the
   per-string segment boundaries;
4. band keys combine each band's rows with a vectorized mix.

Short strings (len < k) fall back to a single "gram" = hash of the whole
string, so equal short strings still co-block.

Determinism: all hash parameters derive from a fixed seed via
``np.random.Generator(PCG64(seed))`` — no wall-clock seeding (the
reference's wall-clock ``Random`` at ``SemanticSignatureEL.java:389`` is a
documented nondeterminism we deliberately fix, SURVEY §7).
"""

from __future__ import annotations

import numpy as np

_P = np.uint64(1099511628211)       # FNV-ish odd multiplier for rolling hash
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def _utf8_view(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow string array -> (uint8 data buffer, int64 starts, int64 lens)
    — ZERO-COPY views straight into the array's UTF-8 buffers, no Python
    string materialization (round-2 VERDICT "what's wrong" #3: the
    doc-scale dedup/simhash paths were paying ``to_pylist()`` + encode on
    every batch's heaviest column). Nulls hash as empty strings."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off = np.frombuffer(arr.buffers()[1], np.int64)
    else:
        off = np.frombuffer(arr.buffers()[1], np.int32)
    off = off[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    dbuf = arr.buffers()[2]
    data = (np.frombuffer(dbuf, np.uint8) if dbuf is not None
            else np.zeros(0, np.uint8))
    return data, off[:-1], off[1:] - off[:-1]


def _as_buffer(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data, starts, lens) from an Arrow array (zero-copy) or a Python
    string sequence (encode fallback for vocabulary-sized inputs)."""
    try:
        import pyarrow as pa

        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            return _utf8_view(texts)
    except ImportError:                      # pragma: no cover
        pass
    enc = [s.encode("utf-8") for s in texts]
    n = len(enc)
    lens = np.fromiter((len(e) for e in enc), np.int64, n)
    data = (np.frombuffer(b"".join(enc), dtype=np.uint8)
            if n and lens.sum() else np.zeros(0, np.uint8))
    starts = np.zeros(n, np.int64)
    if n:
        np.cumsum(lens[:-1], out=starts[1:])
    return data, starts, lens


def _wholestring_hashes(data: np.ndarray, starts: np.ndarray,
                        lens: np.ndarray) -> np.ndarray:
    """One 64-bit hash per variable-length byte segment, fully vectorized
    (no per-row or per-byte Python — the old short-string path looped
    Python over every byte, which on whole-document content hashing was
    the hot path). Order-aware via position mixing: each (byte, position)
    pair maps through splitmix64 and the row sums via a cumsum gather;
    the row length re-mixes at the end."""
    n = len(starts)
    out = np.zeros(n, np.uint64)
    total = int(lens.sum())
    with np.errstate(over="ignore"):
        if total:
            ends_flat = np.cumsum(lens)
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                ends_flat - lens, lens)                  # local byte index
            src = np.repeat(starts, lens) + pos
            x = (data[src].astype(np.uint64) + np.uint64(1)) * _P \
                ^ (pos.astype(np.uint64) + np.uint64(1)) * _MIX
            # splitmix64 finalizer (same family as functions/bloom.py)
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            csum = np.concatenate([np.zeros(1, np.uint64), np.cumsum(x)])
            out = csum[ends_flat] - csum[ends_flat - lens]
        out = (out ^ lens.astype(np.uint64) * _P) * _MIX
        out = (out ^ (out >> np.uint64(33))) ^ np.uint64(0x5bf)
    return out


def whole_string_hashes(texts) -> np.ndarray:
    """One uint64 hash per string — Arrow-native (pass the pa.Array
    directly for the zero-copy path). The content-hash / convergence-
    digest kernel."""
    return _wholestring_hashes(*_as_buffer(texts))


def shingle_gram_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (gram_hashes uint64 flat array, offsets int64 [n+1]) where
    grams[offsets[i]:offsets[i+1]] are string i's k-gram hashes.

    ``texts`` may be a pyarrow (Chunked)Array — preferred on hot paths:
    the UTF-8 buffers are viewed zero-copy, no per-row Python strings —
    or any Python string sequence. Strings shorter than k contribute
    exactly one gram (whole-string hash)."""
    data, starts, lens = _as_buffer(texts)
    n = len(starts)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(1, np.int64)
    # per-string gram counts: max(len - k + 1, 1)
    counts = np.maximum(lens - k + 1, 1)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    grams = np.zeros(total, np.uint64)

    # long strings: rolling polynomial hash over the flat buffer
    long_mask = lens >= k
    if long_mask.any() and len(data) >= k:
        with np.errstate(over="ignore"):
            h = np.zeros(len(data) - k + 1, np.uint64)
            b64 = data.astype(np.uint64)
            for j in range(k):
                h = h * _P + b64[j: len(b64) - k + 1 + j]
            h = (h ^ (h >> np.uint64(33))) * _MIX
        # gather grams for all long strings at once: flat gram g of string i
        # reads h[starts[i] + (g - offsets[i])]
        src = np.repeat(starts - offsets[:-1], counts) + np.arange(total)
        long_flat = np.repeat(long_mask, counts)
        np.clip(src, 0, len(h) - 1, out=src)
        grams[long_flat] = h[src[long_flat]]

    # short strings: single whole-string hash (vectorized)
    if not long_mask.all():
        sh = ~long_mask
        grams[offsets[:-1][sh]] = _wholestring_hashes(
            data, starts[sh], lens[sh])
    return grams, offsets


def word_ngram_hashes(token_hashes: np.ndarray, row_offsets: np.ndarray,
                      n: int) -> tuple[np.ndarray, np.ndarray]:
    """Word-level n-gram hashes from per-token hashes.

    ``token_hashes`` is a flat uint64 array of one hash per token;
    ``row_offsets`` is int64 [nrows+1] giving each row's token segment.
    Returns (gram_hashes uint64 flat, offsets int64 [nrows+1]) where a
    row with fewer than ``n`` tokens contributes ZERO grams (matching
    SQL's ``generate_series(1, len(ws)-n+1)`` emitting nothing).

    Same one-shot vectorized shape as :func:`shingle_gram_hashes`: the
    rolling combine runs once over the flat token-hash array, then a
    repeat/arange gather pulls each row's valid window positions —
    no per-row Python."""
    nrows = len(row_offsets) - 1
    lens = row_offsets[1:] - row_offsets[:-1]
    counts = np.maximum(lens - n + 1, 0)
    offsets = np.zeros(nrows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0 or len(token_hashes) < n:
        return np.zeros(0, np.uint64), offsets
    with np.errstate(over="ignore"):
        win = len(token_hashes) - n + 1
        h = np.zeros(win, np.uint64)
        for j in range(n):
            h = h * _P + token_hashes[j: win + j]
        h = (h ^ (h >> np.uint64(33))) * _MIX
    # flat gram g of row i reads h[row_offsets[i] + (g - offsets[i])]
    src = (np.repeat(row_offsets[:-1] - offsets[:-1], counts)
           + np.arange(total, dtype=np.int64))
    return h[src], offsets


def minhash_signatures(gram_hashes: np.ndarray, offsets: np.ndarray,
                       num_perm: int, seed: int) -> np.ndarray:
    """MinHash signature matrix [n, num_perm] (uint64)."""
    n = len(offsets) - 1
    sig = np.empty((n, num_perm), np.uint64)
    if n == 0:
        return sig
    a, b = _hash_params(num_perm, seed)
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hp = gram_hashes * a[p] + b[p]
            sig[:, p] = np.minimum.reduceat(hp, starts)
    return sig


def band_keys(sig: np.ndarray, band_rows: int) -> np.ndarray:
    """Collapse each LSH band's rows into one uint64 key; returns [n, bands].

    The caller emits (mention_id, band_index, band_key) rows; the block key
    is the (band_index, band_key) pair so different bands never collide.
    """
    n, num_perm = sig.shape
    bands = num_perm // band_rows
    out = np.empty((n, bands), np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            h = np.uint64(1469598103934665603)
            acc = np.full(n, h, np.uint64)
            for r in range(band_rows):
                acc = (acc ^ sig[:, b * band_rows + r]) * _P
            out[:, b] = acc
    return out


def block_keys_for(texts: "np.ndarray | list[str]", k: int, num_perm: int,
                   band_rows: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Convenience: texts -> (row_index int64, block_key string) exploded
    arrays, one row per (text, band)."""
    grams, offsets = shingle_gram_hashes(texts, k)
    sig = minhash_signatures(grams, offsets, num_perm, seed)
    bk = band_keys(sig, band_rows)
    n, bands = bk.shape
    row_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
    band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
    keys = bk.reshape(-1)
    # numeric mixed (band, hash) block key: int64 keys shuffle/sort/hash
    # far cheaper than the equivalent "band:hash" strings at corpus scale
    import pyarrow as pa

    key_arr = pa.array(mix_band(band_idx.astype(np.uint64), keys), pa.int64())
    return row_idx, key_arr


def jaccard_from_signatures(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard similarity of aligned signature rows."""
    return (sig_a == sig_b).mean(axis=1)


def mix_band(band_idx: "np.ndarray | int", band_hash: np.ndarray) -> np.ndarray:
    """Collapse (band index, band hash) into one NON-NEGATIVE int64 — the
    numeric twin of the "band:hash" block-key string, used for vectorized
    hot-key lookups and the first-collision-band pair dedup (stages/pairs.py).

    The result is masked to 63 bits and returned as int64: Ray Data's
    hash-shuffle aggregations do not round-trip uint64 values >= 2^63 —
    per-partition aggregate outputs come back as a mix of int64 and
    pickled-object extension columns, and the mixed schemas segfault
    Arrow's ExecBatchBuilder inside the HashShuffleAggregator (the round-1
    ER-pipeline crash, VERDICT.md "What's wrong" #1). Losing one key bit
    only doubles the (negligible) band-hash collision rate."""
    with np.errstate(over="ignore"):
        mixed = (np.uint64(band_idx) * _MIX ^ np.asarray(band_hash, np.uint64)) * _P
    return (mixed & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)


TOKEN_TIER = 1 << 32        # band-index salt: token-tier keys live in their
                            # own keyspace, disjoint from the LSH bands'


def token_block_keys(norms: "list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Token-tier blocking keys: one (row, key) per (norm, name token),
    so "vardosmor" co-blocks with "vardosmor belullin" even though their
    char-shingle sets barely overlap (the reference's fuzzy tier matches
    them because Lucene TOKENIZES the alias index,
    ``CandidateSelectionLucene.selectCandidatesName:271-294``).

    One helper drives BOTH the pipeline stage (stages/blocking.py) and
    the labels fixture (synth.py) so the evaluated pair universes stay
    aligned when ``cfg.token_blocks`` is on. Returns (row_idx int64,
    keys int64) — keys already int63-masked via ``mix_band``."""
    toks = [n.split(" ") for n in norms]
    flat: list[str] = []
    rows: list[int] = []
    for i, ts in enumerate(toks):
        for t in ts:
            if t:
                flat.append(t)
                rows.append(i)
    if not flat:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    h, _ = shingle_gram_hashes(flat, 1 << 30)
    return np.asarray(rows, np.int64), mix_band(np.uint64(TOKEN_TIER), h)


def block_keys_with_bands(texts, k: int, num_perm: int, band_rows: int,
                          seed: int):
    """Exploded blocking arrays plus per-row band metadata.

    Returns (row_idx int64[n*bands], key int64 Array, band_idx
    int64[n*bands], mixed int64[n, bands]) where ``mixed[i]`` is the full
    mixed-band-key vector of text i (identical for every exploded row of i).
    Keys are numerically identical to ``block_keys_for``'s.
    """
    grams, offsets = shingle_gram_hashes(texts, k)
    sig = minhash_signatures(grams, offsets, num_perm, seed)
    bk = band_keys(sig, band_rows)
    n, bands = bk.shape
    row_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
    band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
    keys = bk.reshape(-1)
    import pyarrow as pa

    key_arr = pa.array(mix_band(band_idx.astype(np.uint64), keys), pa.int64())
    mixed = mix_band(np.arange(bands, dtype=np.uint64)[None, :], bk)
    return row_idx, key_arr, band_idx, mixed
