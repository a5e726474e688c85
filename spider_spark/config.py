"""Engine config file (E5 — ConfigController analog).

The reference keeps ``config.ini`` with ``[DATABASE]``
(type/username/password/host/name) and ``[INFRASTRUCTURE]``
(proxy_host, concurrency_limit) sections (config_sections.py:9-10,
config.ini.example:1-9), loaded/updated by ``ConfigController``
(config_controller.py:27-33,71-95) and rewritten by ``--db-update``
(cli.py:111-129). This engine's equivalents:

* ``[STORE]``: ``root`` (TableIO root directory), ``pages`` (the pages
  table path — the engine's "web"), ``backend`` (``parquet``/``iceberg``).
* ``[INFRASTRUCTURE]``: ``concurrency_limit`` (the per-host politeness
  budget, ≡ ``--concur``), ``master`` (the Spark master).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass

DEFAULT_PATH = os.path.join(os.path.expanduser("~"), ".spider_spark.ini")

_DEFAULTS = {
    "STORE": {"root": "./spider_store", "pages": "", "backend": "parquet"},
    "INFRASTRUCTURE": {"concurrency_limit": "5", "master": "local[*]",
                       "proxy_host": ""},
}


@dataclass
class EngineConfig:
    root: str
    pages: str
    backend: str
    concurrency_limit: int
    master: str
    proxy_host: str = ""


class ConfigController:
    """Load/update the ini file; missing file → defaults (the reference
    creates an empty config on first run, config_controller.py:27-33)."""

    def __init__(self, path: str | None = None):
        self.path = path or os.environ.get("SPIDER_SPARK_CONFIG", DEFAULT_PATH)
        self._cp = configparser.ConfigParser()
        if os.path.exists(self.path):
            self._cp.read(self.path)
        for section, kv in _DEFAULTS.items():
            if not self._cp.has_section(section):
                self._cp.add_section(section)
            for k, v in kv.items():
                if not self._cp.has_option(section, k):
                    self._cp.set(section, k, v)

    def is_section_empty(self, section: str) -> bool:
        return not any(self._cp.get(section, k) for k in self._cp.options(section))

    def get(self, section: str, key: str) -> str:
        return self._cp.get(section, key)

    def set(self, section: str, key: str, value: str) -> None:
        self._cp.set(section, key, str(value))

    def save(self) -> None:
        with open(self.path, "w") as f:
            self._cp.write(f)

    def load(self) -> EngineConfig:
        return EngineConfig(
            root=self.get("STORE", "root"),
            pages=self.get("STORE", "pages"),
            backend=self.get("STORE", "backend"),
            concurrency_limit=int(self.get("INFRASTRUCTURE", "concurrency_limit")),
            master=self.get("INFRASTRUCTURE", "master"),
            proxy_host=self.get("INFRASTRUCTURE", "proxy_host"),
        )
