"""Job configuration: flat key->value store with XML template loading and
CLI override, reference-parity boolean parsing.

Semantics studied from the reference:
  * getBooleanValue (OptimizeRasters.py:56-67): case-insensitive
    {'true','yes','t','1','y'} -> True, everything else False; real bools
    pass through; None -> False.
  * Config.init/getValue/setValue (:5245-5286): flat <Defaults> children,
    CASE-SENSITIVE keys, later setValue overrides (CLI args win).
  * formatExtensions (:5321-5328): comma lists split + trimmed.
  * mode whitelist (:5533-5553).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any

VALID_MODES = (
    "tif", "tif_lzw", "tif_jpeg", "tif_cog", "tif_mix", "tif_dg",
    "tiff_landsat", "mrf", "mrf_jpeg", "mrf_mix", "mrf_dg", "mrf_landsat",
    "cachingmrf", "clonemrf", "rasterproxy", "splitmrf", "bundle", "aid",
    "iiq",
)

TRUTHY = frozenset(["true", "yes", "t", "1", "y"])


def get_boolean_value(value: Any) -> bool:
    """Reference-parity truthiness (OptimizeRasters.py:56-67)."""
    if value is None:
        return False
    if isinstance(value, bool):
        return value
    return str(value).lower() in TRUTHY


def format_extensions(csv: str | None) -> list[str]:
    """Comma list -> trimmed non-empty items (:5321-5328)."""
    if not csv:
        return []
    return [x.strip() for x in str(csv).split(",") if x.strip()]


class Config:
    """Flat, case-sensitive key->value config with XML template load."""

    def __init__(self, values: dict[str, str] | None = None):
        self._values: dict[str, str] = dict(values or {})

    @classmethod
    def from_xml(cls, path: str) -> "Config":
        """Load a template: every leaf under <Defaults> becomes a key.
        Missing/empty text -> ''."""
        root = ET.parse(path).getroot()
        defaults = root.find(".//Defaults")
        node = defaults if defaults is not None else root
        vals = {}
        for child in node:
            vals[child.tag] = (child.text or "").strip()
        return cls(vals)

    def get_value(self, key: str, default: Any = None) -> Any:
        v = self._values.get(key)
        if v is None or v == "":
            return default
        return v

    def set_value(self, key: str, value: Any) -> None:
        self._values[key] = value

    def get_boolean(self, key: str, default: bool = False) -> bool:
        v = self._values.get(key)
        if v is None or v == "":
            return default
        return get_boolean_value(v)

    def extensions(self, key: str) -> list[str]:
        return format_extensions(self._values.get(key))

    def validate_mode(self) -> str:
        mode = str(self.get_value("Mode", "mrf")).lower()
        base = mode.split("_")[0] if mode not in VALID_MODES else mode
        if mode not in VALID_MODES and base not in VALID_MODES:
            raise ValueError(f"invalid mode: {mode!r}")
        return mode

    def as_dict(self) -> dict[str, str]:
        return dict(self._values)
