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


def load_embed_backend(
    model_name: str = "cl-nagoya/ruri-large",
    dim: int = 64,
    model_dir: str | None = None,
):
    """Resolve the embedding kernel once per process. Returns
    ``(encode, backend)`` where ``encode(list[str]) -> np.ndarray`` of shape
    ``(n, model_dim)`` and ``backend`` names the branch taken
    (``"sentence_transformers"`` or ``"fallback"``).

    Mirrors the reference's cache-aside model loading
    (``/root/reference/model/search/vector.py:50-60``): if ``model_dir`` is
    given and ``<model_dir>/<basename(model_name)>`` exists, load from that
    local path; otherwise download by name (``HF_TOKEN`` honored, as in the
    reference) and ``model.save()`` to the local path so the next process
    skips the download. Without sentence-transformers importable, a
    deterministic md5-seeded unit vector stands in — stable across runs,
    engines and partitionings, so pipelines built on it are testable.
    """
    import numpy as np

    try:
        import os

        from sentence_transformers import SentenceTransformer  # noqa: PLC0415

        if model_dir is not None:
            local_path = os.path.join(model_dir, model_name.rsplit("/", 1)[-1])
            if os.path.exists(local_path):
                model = SentenceTransformer(local_path)
            else:
                model = SentenceTransformer(
                    model_name, token=os.environ.get("HF_TOKEN")
                )
                model.save(local_path)  # vector.py:60 (保存)
        else:
            model = SentenceTransformer(model_name)

        def encode(texts: list[str]) -> np.ndarray:
            return model.encode(texts, convert_to_numpy=True)

        return encode, "sentence_transformers"
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

        return encode, "fallback"


def make_embedder_udf(
    model_name: str = "cl-nagoya/ruri-large",
    dim: int = 64,
    model_dir: str | None = None,
):
    """Series→Series pandas_udf: text → float embedding vector.

    Lazy per-executor singleton: the model loads on the first Arrow batch of
    each executor process (``load_embed_backend``) and is reused for every
    later batch — loading per batch would dominate runtime; loading on the
    driver would ship weights through the closure.

    The returned udf exposes ``embed.raw`` (the plain Series→Series batch
    function) so unit tests can drive batches in-process, and
    ``embed.state`` (the singleton cell: ``encode`` + ``backend`` after the
    first batch) so branch selection and reuse are observable.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    state: dict = {}

    def _embed_batch(texts):
        if "encode" not in state:
            state["encode"], state["backend"] = load_embed_backend(
                model_name, dim, model_dir
            )
        mat = state["encode"](texts.fillna("").tolist())
        return pd.Series([row.tolist() for row in np.asarray(mat, dtype=np.float32)])

    embed = pandas_udf(ArrayType(FloatType()))(_embed_batch)
    embed.raw = _embed_batch
    embed.state = state
    return embed


def load_tokenizer_backend():
    """Resolve the tokenizer kernel once per process. Returns
    ``(tokenize, backend)`` where ``tokenize(str) -> str`` is space-joined
    tokens and ``backend`` is ``"mecab"`` or ``"fallback"``.

    The MeCab branch wraps wakati segmentation exactly as the reference does
    (``/root/reference/model/utils/tokenizer.py:27-37``: ``Tagger("-Owakati")``
    → ``parse().strip()``). The fallback is a Unicode-aware regex (latin
    words / digit runs / single CJK chars) — documented as differing from
    wakati on Japanese text."""
    import re

    try:
        from fugashi import Tagger  # noqa: PLC0415

        tagger = Tagger("-Owakati")
        return (lambda t: tagger.parse(t).strip()), "mecab"
    except Exception:  # noqa: BLE001
        pat = re.compile(r"[A-Za-z]+|[0-9]+|[぀-ヿ一-鿿]")
        return (lambda t: " ".join(pat.findall(t))), "fallback"


def make_tokenizer_udf():
    """Series→Series pandas_udf: text → space-joined tokens (the reference's
    MeCab wakati output shape). Lazy per-executor singleton, same pattern as
    ``make_embedder_udf``; exposes ``tokenize.raw`` / ``tokenize.state`` for
    in-process unit tests of branch selection and singleton reuse."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    state: dict = {}

    def _tokenize_batch(texts):
        if "tok" not in state:
            state["tok"], state["backend"] = load_tokenizer_backend()
        tok = state["tok"]
        return texts.fillna("").map(tok)

    tokenize = pandas_udf(StringType())(_tokenize_batch)
    tokenize.raw = _tokenize_batch
    tokenize.state = state
    return tokenize
