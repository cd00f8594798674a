"""Multimodal text fusion for Time-MMD forecasting.

Capability parity with the multimodal Climate/Energy scripts
(``/root/reference/train_kan_fet_mmd_climate_multimodal.py:262-467``,
energy twin differs only in paths): join the numeric series with report /
search text on (start_date, end_date), build one combined text field,
embed it with train-only TF-IDF (1-2grams, max 20k features) +
TruncatedSVD, concatenate with numeric features, standardise train-only.

This is a host-side preprocessing stage (sklearn on CPU); the output is a
frozen (N, F_num + text_dim) array that enters the jitted pipeline like
any other feature matrix.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def merge_with_text(numeric_df, report_df, search_df,
                    join_cols: Sequence[str] = ("start_date", "end_date"),
                    text_cols: Sequence[str] = ("fact", "preds"),
                    date_col: str = "date"):
    """Left-join report and search text onto the numeric frame and build a
    single combined ``text`` field per row."""
    import pandas as pd

    dfs = [numeric_df.copy(), report_df.copy(), search_df.copy()]
    for df in dfs:
        for c in list(join_cols) + ["ValidStart", "ValidEnd"]:
            if c in df.columns:
                df[c] = pd.to_datetime(df[c], errors="coerce")
    numeric, report, search = dfs

    for src, dst in (("ValidStart", "start_date"), ("ValidEnd", "end_date")):
        if dst not in numeric.columns and src in numeric.columns:
            numeric[dst] = numeric[src]

    small = lambda df: df[list(join_cols) + list(text_cols)].copy()
    merged = numeric.merge(small(report), on=list(join_cols), how="left",
                           suffixes=("", "_report"))
    merged = merged.merge(small(search), on=list(join_cols), how="left",
                          suffixes=("", "_search"))

    def s(x):
        return "" if pd.isna(x) else str(x)

    merged["text"] = (
        "REPORT_FACT: " + merged["fact"].map(s) + "\n"
        + "REPORT_PREDS: " + merged["preds"].map(s) + "\n"
        + "SEARCH_FACT: " + merged["fact_search"].map(s) + "\n"
        + "SEARCH_PREDS: " + merged["preds_search"].map(s)
    )

    if "MapDate" in merged.columns:
        merged[date_col] = pd.to_datetime(merged["MapDate"].astype(str),
                                          format="%Y%m%d", errors="coerce")
    elif "start_date" in merged.columns:
        merged[date_col] = merged["start_date"]
    return merged.sort_values(date_col).reset_index(drop=True)


def embed_text(texts: Sequence[str], train_end: int,
               max_features: int = 20000, ngram_range=(1, 2),
               min_df: int = 2, embed_dim: int = 7, seed: int = 0):
    """Train-only TF-IDF + TruncatedSVD text embedding -> (N, embed_dim)."""
    from sklearn.decomposition import TruncatedSVD
    from sklearn.feature_extraction.text import TfidfVectorizer

    texts = ["" if t is None else str(t) for t in texts]
    vec = TfidfVectorizer(max_features=max_features, ngram_range=ngram_range,
                          min_df=min_df)
    tfidf_train = vec.fit_transform(texts[:train_end])
    tfidf_all = vec.transform(texts)

    n_comp = min(embed_dim, tfidf_train.shape[1] - 1) if tfidf_train.shape[1] > 1 else 1
    svd = TruncatedSVD(n_components=max(n_comp, 1), random_state=seed)
    svd.fit(tfidf_train)
    emb = svd.transform(tfidf_all).astype(np.float32)
    if emb.shape[1] < embed_dim:       # pad if vocabulary was tiny
        emb = np.pad(emb, ((0, 0), (0, embed_dim - emb.shape[1])))
    return emb, vec, svd


def fuse_features(X_num: np.ndarray, texts: Sequence[str], train_end: int,
                  embed_dim: int = 7, **embed_kw):
    """Numeric + text-embedding feature matrix (N, F_num + embed_dim)."""
    emb, vec, svd = embed_text(texts, train_end, embed_dim=embed_dim,
                               **embed_kw)
    X = np.concatenate([X_num.astype(np.float32), emb], axis=1)
    return X, {"vectorizer": vec, "svd": svd}


def assert_feature_dim(model_in_dim: int, X: np.ndarray):
    """Guard matching the reference's ``assert_model_feature_dim``
    (multimodal script :449-467)."""
    if X.shape[1] != model_in_dim:
        raise ValueError(
            f"model expects {model_in_dim} features but data has {X.shape[1]}"
            " — rebuild the model after text fusion changes the feature dim")
