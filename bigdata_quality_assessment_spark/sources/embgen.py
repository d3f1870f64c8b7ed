"""Planted-near-duplicate embedding corpus (round-12 verdict ask #1).

The driver's synthetic ``embeddings`` table carries no planted
near-duplicates (max pairwise cosine ~0.51), so the graded
``x_embedding_near_dedup`` entry could only ever check engine PARITY
of an artificial wide-threshold edge set — a recall regression in the
banding (the exact defect shape the round-11 MinHash lane-family bug
proved possible) would not flip any hash. This module generates an
embedding corpus with *known* near-duplicate structure so recall is a
measurable, per-round-graded quantity, mirroring
:mod:`.textgen` for the text-dedup family:

* **originals** are unit-normalized isotropic Gaussian vectors — a
  pure function of ``(seed, key)`` under a Philox keyed stream;
* **dups** are bit-exact float32 copies of an original;
* **nears** sit at a *controlled cosine* to their source: for target
  cosine ``c`` drawn uniformly from ``near_cosine_range``, the
  planted vector is ``c·u + sqrt(1-c²)·w`` with ``w`` a unit vector
  orthogonalized (Gram–Schmidt) against the source ``u`` — so the
  planted float64 cosine is exactly ``c`` and the float32-rounded
  cosine is within ~1e-6 of it, far from any grading threshold;
* ground truth rides along in ``role`` ('orig' | 'dup' | 'near') and
  ``src_id`` (the copied original, NULL for originals) so banded-LSH
  recall and original-survival are computable from the output alone.

Determinism is the counter-RNG discipline of
``sources/generators.py``: every vector is a pure function of
``(seed, key)``, evaluated inside an Arrow ``mapInPandas`` pass over
``spark.range(n_vecs)`` — identical output for ANY partitioning or
cluster size. Role assignment is a pure hash of the id; dup/near
sources are rejection-sampled to land on originals, exactly the
:func:`.textgen.realistic_documents` scheme.

Output schema matches the driver's ``embeddings`` table
(``vec_id, embedding array<float>, label``) plus ``role`` and
``src_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = (
    "vec_id long, embedding array<float>, label int, "
    "role string, src_id long"
)


def planted_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    dup_rate: float = 0.06,
    near_rate: float = 0.08,
    near_cosine_range: tuple[float, float] = (0.92, 0.98),
    n_labels: int = 8,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the corpus as one distributed Arrow pass over
    ``spark.range(n_vecs)`` (see module docstring for semantics).
    Every vector is a pure function of the row id — identical output
    under any partitioning; scale by raising ``n_vecs``."""
    if dup_rate + near_rate >= 1.0:
        raise ValueError("dup_rate + near_rate must sum below 1")
    c_lo, c_hi = near_cosine_range
    if not (0.0 < c_lo <= c_hi < 1.0):
        raise ValueError("near_cosine_range must satisfy 0 < lo <= hi < 1")

    def gen(batches):
        import numpy as np
        import pandas as pd

        def role_of(vid: int) -> str:
            # pure hash of the id: any worker can classify any id
            # (dup/near sources must land on originals)
            u = np.random.Generator(
                np.random.Philox(key=[seed + 1, vid])
            ).random()
            if vid >= 16:  # first vectors are always originals
                if u < dup_rate:
                    return "dup"
                if u < dup_rate + near_rate:
                    return "near"
            return "orig"

        def base_vec(key: int) -> tuple[np.ndarray, int]:
            """The ORIGINAL unit vector + label for a key — pure
            function of (seed, key); dups re-generate their source."""
            g = np.random.Generator(np.random.Philox(key=[seed, key]))
            v = g.standard_normal(dim)
            v /= np.linalg.norm(v)
            return v, int(g.integers(0, n_labels))

        for pdf in batches:
            out = {
                "vec_id": [], "embedding": [], "label": [],
                "role": [], "src_id": [],
            }
            for vid in pdf["id"]:
                vid = int(vid)
                role = role_of(vid)
                g2 = np.random.Generator(
                    np.random.Philox(key=[seed + 2, vid])
                )
                if role in ("dup", "near"):
                    src = vid
                    while True:
                        src = int(g2.integers(0, vid))
                        if role_of(src) == "orig":
                            break
                    u, label = base_vec(src)
                    if role == "dup":
                        v = u
                    else:
                        # Gram-Schmidt an orthogonal unit direction,
                        # then rotate to the drawn target cosine
                        w = g2.standard_normal(dim)
                        w -= (w @ u) * u
                        w /= np.linalg.norm(w)
                        c = c_lo + (c_hi - c_lo) * g2.random()
                        v = c * u + np.sqrt(1.0 - c * c) * w
                    src_id = src
                else:
                    v, label = base_vec(vid)
                    src_id = None
                out["vec_id"].append(vid)
                out["embedding"].append(v.astype("float32"))
                out["label"].append(label)
                out["role"].append(role)
                out["src_id"].append(src_id)
            yield pd.DataFrame(out)

    rng = (
        spark.range(n_vecs)
        if num_partitions is None
        else spark.range(n_vecs, numPartitions=num_partitions)
    )
    return rng.mapInPandas(gen, _SCHEMA)
