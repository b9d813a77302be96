"""Codelist resolver — SURVEY §2.1's dictionary-lookup stage.

Both halves of the reference pattern:

- :class:`XmlCodeResolver` — the real thing: gml:Dictionary codelist XML
  parsed lazily ONCE per worker per file and cached by path
  (nusamai-plateau/src/codelist/resolver.rs:10-75's stretto cache ==
  the actor-lifetime ``self._cache`` here; the XML walk mirrors
  codelist/xml.rs:49-120's Definition(name, description) extraction).
- :class:`CodeResolver` — the broadcast-dict variant (``ray.put`` once)
  for in-memory dictionaries.

Resolution is vectorized via pandas map either way; unknown codes pass
through unchanged (the reference keeps the raw code on dictionary miss).
"""

from __future__ import annotations

import os

import pandas as pd

GML_NS = "http://www.opengis.net/gml"


def write_codelist_xml(path: str, mapping: dict[str, str]) -> str:
    """Emit a gml:Dictionary codelist file (the PLATEAU codelist layout the
    reference parses); used to synthesize deterministic fixture codelists."""
    from xml.sax.saxutils import escape

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<gml:Dictionary xmlns:gml="{GML_NS}" gml:id="cl">',
    ]
    for code, label in mapping.items():
        parts.append(
            "<gml:dictionaryEntry><gml:Definition gml:id=\"id_%s\">"
            "<gml:description>%s</gml:description>"
            "<gml:name>%s</gml:name>"
            "</gml:Definition></gml:dictionaryEntry>"
            % (escape(code), escape(label), escape(code))
        )
    parts.append("</gml:Dictionary>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    os.replace(tmp, path)
    return path


def parse_codelist_xml(path: str) -> dict[str, str]:
    """Parse a gml:Dictionary file to {code: label} (codelist/xml.rs:49-120:
    Definition's gml:name is the code, gml:description the value)."""
    import xml.etree.ElementTree as ET

    out: dict[str, str] = {}
    root = ET.parse(path).getroot()
    for defn in root.iter(f"{{{GML_NS}}}Definition"):
        name = defn.find(f"{{{GML_NS}}}name")
        desc = defn.find(f"{{{GML_NS}}}description")
        if name is not None and name.text and desc is not None and desc.text:
            out[name.text] = desc.text
    return out


class XmlCodeResolver:
    """Actor-pool stage: resolve codes against a codelist XML file.

    The file parses ONCE per actor on first use and stays cached for the
    actor's lifetime (the resolver.rs path-keyed cache); batches then
    resolve with one vectorized map.
    """

    def __init__(self, codelist_path: str, code_col: str = "lang",
                 out_col: str = "lang_label"):
        self.path = codelist_path
        self.code_col = code_col
        self.out_col = out_col
        self._cache: dict[str, dict[str, str]] = {}

    def _dict_for(self, path: str) -> dict[str, str]:
        d = self._cache.get(path)
        if d is None:
            d = self._cache[path] = parse_codelist_xml(path)
        return d

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        codes = self._dict_for(self.path)
        col = batch[self.code_col]
        batch[self.out_col] = col.map(codes).fillna(col)
        return batch

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
