"""Model-inference column ops (SURVEY.md §2.10 U1/U2).

The reference embeds text with sentence-transformers ``cl-nagoya/ruri-large``
(lazy-loaded once per process, ``/root/reference/model/search/vector.py:50-78``)
and tokenizes Japanese with MeCab (``model/utils/tokenizer.py:27-37``).
Neither the model weights nor MeCab ship in this environment, so both
operators gate their real backend behind an import-try and fall back to a
deterministic stand-in — the DISTRIBUTED mechanics (Arrow-batched pandas_udf,
lazy per-executor singleton, batch sizing) are the real implementation either
way; only the kernel inside swaps.

Reference semantic detail preserved: ruri models require the "文章: " /
"クエリ: " prefixes before encoding (``vector.py:123,164``) — dropping them
changes scores, so the prefix helpers are part of this API.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DOC_PREFIX = "文章: "    # /root/reference/model/search/vector.py:123
QUERY_PREFIX = "クエリ: "  # /root/reference/model/search/vector.py:164


def with_doc_prefix(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(DOC_PREFIX), c)


def with_query_prefix(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(QUERY_PREFIX), c)


def make_embedder_udf(model_name: str = "cl-nagoya/ruri-large", dim: int = 64):
    """Series→Series pandas_udf: text → float embedding vector.

    Lazy per-executor singleton: the model loads on the first Arrow batch of
    each executor process and is reused for every later batch (loading per
    batch would dominate runtime; loading on the driver would ship weights
    through the closure). Without sentence-transformers installed, a
    deterministic md5-seeded unit vector stands in — stable across runs,
    engines and partitionings, so pipelines built on it are testable.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    state: dict = {}

    def _load_backend():
        try:
            from sentence_transformers import SentenceTransformer  # noqa: PLC0415

            model = SentenceTransformer(model_name)

            def encode(texts: list[str]) -> np.ndarray:
                return model.encode(texts, convert_to_numpy=True)

            return encode
        except Exception:  # noqa: BLE001 — no weights/package here
            import hashlib

            def encode(texts: list[str]) -> np.ndarray:
                out = np.empty((len(texts), dim), dtype=np.float32)
                for i, t in enumerate(texts):
                    seed = int.from_bytes(
                        hashlib.md5((t or "").encode()).digest()[:8], "big"
                    )
                    rng = np.random.default_rng(seed)
                    v = rng.standard_normal(dim).astype(np.float32)
                    out[i] = v / (np.linalg.norm(v) or 1.0)
                return out

            return encode

    @pandas_udf(ArrayType(FloatType()))
    def embed(texts):
        if "encode" not in state:
            state["encode"] = _load_backend()
        mat = state["encode"](texts.fillna("").tolist())
        return pd.Series([row.tolist() for row in np.asarray(mat, dtype=np.float32)])

    return embed


def make_tokenizer_udf():
    """Series→Series pandas_udf: text → space-joined tokens (the reference's
    MeCab wakati output shape, ``model/utils/tokenizer.py:27-37``). Falls
    back to a Unicode-aware regex (latin words / digit runs / single CJK
    chars) when no MeCab binding is importable."""
    import pandas as pd
    import re
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    state: dict = {}

    def _load_backend():
        try:
            from fugashi import Tagger  # noqa: PLC0415

            tagger = Tagger("-Owakati")
            return lambda t: tagger.parse(t).strip()
        except Exception:  # noqa: BLE001
            pat = re.compile(r"[A-Za-z]+|[0-9]+|[぀-ヿ一-鿿]")
            return lambda t: " ".join(pat.findall(t))

    @pandas_udf(StringType())
    def tokenize(texts):
        if "tok" not in state:
            state["tok"] = _load_backend()
        tok = state["tok"]
        return texts.fillna("").map(tok)

    return tokenize
