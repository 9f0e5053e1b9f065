"""Layer/config catalog — tilemaker-compatible JSON (LayerDef/Config).

Mirrors the reference's config parsing (src/shared_data.cpp:111-195,
CONFIGURATION.md:28-79): per-layer minzoom/maxzoom, simplify_below /
simplify_level / simplify_length / simplify_ratio, write_to grouping
(layerOrder, src/shared_data.cpp:42-56), and global settings
(basezoom, minzoom, maxzoom, compress, include_ids, bounding_box).

The config object is small and driver-side; it is broadcast to the
encode UDFs.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

from .kernels import mercator as M


@dataclass
class LayerDef:
    name: str
    minzoom: int = 0
    maxzoom: int = 14
    simplify_below: int = 0     # simplify at z < simplify_below
    simplify_level: float = 0.0
    simplify_length: float = 0.0  # meters; overrides level if > 0
    simplify_ratio: float = 2.0
    write_to: str | None = None   # parent layer this one is merged into
    index: int = 0                # declaration order (W4 output ordering)

    def simplify_tolerance(self, zoom: int, tile_y: int) -> float:
        """Per-zoom Douglas-Peucker tolerance in projected degrees.

        Exact formula from the reference (src/tile_worker.cpp:167-176).
        """
        if zoom >= self.simplify_below:
            return 0.0
        if self.simplify_length > 0:
            latp = (float(M.tiley2latp(tile_y, zoom)) + float(M.tiley2latp(tile_y + 1, zoom))) / 2.0
        else:
            latp = 0.0
        if self.simplify_length > 0:
            level = float(M.meter2degp(self.simplify_length, latp))
        else:
            level = self.simplify_level
        return level * math.pow(self.simplify_ratio, (self.simplify_below - 1) - zoom)


@dataclass
class Config:
    layers: dict = field(default_factory=dict)        # name -> LayerDef
    layer_order: list = field(default_factory=list)   # [[sublayer names]] in output order (W4)
    basezoom: int = 14
    minzoom: int = 0
    maxzoom: int = 14
    compress: bool = True
    gzip: bool = True
    include_ids: bool = False
    combine_similar: bool = False   # reference --combine (src/tilemaker.cpp:79);
    # NOTE: from_json defaults this to TRUE (reference parity) — the bare
    # dataclass default stays False only for direct-constructed test configs
    mvt_version: int = 2
    bounding_box: list | None = None  # [minlon, minlat, maxlon, maxlat] (F7)
    name: str = "tilemaker_spark"

    @classmethod
    def from_json(cls, text: str) -> "Config":
        """Parse tilemaker-style config JSON (reference: src/shared_data.cpp:111-195)."""
        raw = json.loads(text)
        cfg = cls()
        settings = raw.get("settings", {})
        cfg.basezoom = int(settings.get("basezoom", 14))
        cfg.minzoom = int(settings.get("minzoom", 0))
        cfg.maxzoom = int(settings.get("maxzoom", cfg.basezoom))
        cfg.compress = bool(settings.get("compress", True))
        cfg.include_ids = bool(settings.get("include_ids", False))
        # reference --combine defaults ON (src/tilemaker.cpp:79); a JSON
        # config that says nothing gets the reference behavior, and
        # "combine": false opts out (our DEFAULT_CONFIG_JSON does, to keep
        # the cheap concat path on the synthetic bench corpus)
        cfg.combine_similar = bool(settings.get("combine", True))
        cfg.name = settings.get("name", cfg.name)
        if "bounding_box" in settings:
            cfg.bounding_box = list(settings["bounding_box"])
        # layer parse, preserving declaration order
        write_to_groups: dict = {}
        for i, (lname, ld) in enumerate(raw.get("layers", {}).items()):
            layer = LayerDef(
                name=lname,
                minzoom=int(ld.get("minzoom", 0)),
                maxzoom=int(ld.get("maxzoom", cfg.maxzoom)),
                simplify_below=int(ld.get("simplify_below", 0)),
                simplify_level=float(ld.get("simplify_level", 0.0)),
                simplify_length=float(ld.get("simplify_length", 0.0)),
                simplify_ratio=float(ld.get("simplify_ratio", 2.0)),
                write_to=ld.get("write_to"),
                index=i,
            )
            cfg.layers[lname] = layer
        # layerOrder: write_to groups collapse into their target layer
        # (reference: src/shared_data.cpp:42-56)
        for lname, layer in cfg.layers.items():
            tgt = layer.write_to or lname
            write_to_groups.setdefault(tgt, []).append(lname)
        cfg.layer_order = [write_to_groups[t] for t in write_to_groups]
        return cfg

    def output_layer_of(self, layer_name: str) -> str:
        ld = self.layers.get(layer_name)
        return (ld.write_to or layer_name) if ld else layer_name


# Default catalog for the web-page-geocoded pipeline — layer vocab follows
# the reference's example configs (config.json, resources/config-testdata.json)
DEFAULT_CONFIG_JSON = """
{
  "layers": {
    "poi":            { "minzoom": 12, "maxzoom": 14 },
    "place":          { "minzoom": 4,  "maxzoom": 14 },
    "transportation": { "minzoom": 8,  "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003 },
    "waterway":       { "minzoom": 8,  "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003 },
    "building":       { "minzoom": 13, "maxzoom": 14 },
    "landcover":      { "minzoom": 6,  "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003 },
    "water":          { "minzoom": 6,  "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003, "write_to": "landcover" }
  },
  "settings": {
    "basezoom": 14, "minzoom": 0, "maxzoom": 14,
    "compress": true, "include_ids": false, "combine": false,
    "name": "tilemaker_spark"
  }
}
"""


def default_config() -> Config:
    return Config.from_json(DEFAULT_CONFIG_JSON)
