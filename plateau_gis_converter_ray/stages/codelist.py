"""Codelist resolver — SURVEY §2.1's dictionary-lookup stage.

The reference lazily loads XML code dictionaries and caches them per worker
(nusamai-plateau/src/codelist/resolver.rs:10-75, stretto cache). Here the
codelist is a small broadcast dict (``ray.put`` once); each actor holds it
for its lifetime and resolves codes vectorized via pandas map / Arrow
dictionary join. Unknown codes pass through unchanged (the reference keeps
the raw code when the dictionary misses)."""

from __future__ import annotations

import pandas as pd

# the "codelist" for the documents table's lang codes (ISO639-ish)
LANG_CODELIST = {
    "en": "English",
    "de": "German",
    "fr": "French",
    "es": "Spanish",
    "zh": "Chinese",
    "ja": "Japanese",
}


class CodeResolver:
    def __init__(self, codelist_ref=None, code_col: str = "lang",
                 out_col: str = "lang_label"):
        codelist = codelist_ref if codelist_ref is not None else LANG_CODELIST
        try:
            import ray

            if isinstance(codelist, ray.ObjectRef):
                codelist = ray.get(codelist)
        except Exception:
            pass
        self.codelist = dict(codelist)
        self.code_col = code_col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        col = batch[self.code_col]
        batch[self.out_col] = col.map(self.codelist).fillna(col)
        return batch
