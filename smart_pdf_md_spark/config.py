"""Run-config loading & precedence (SURVEY.md §3.2 stages 2-5).

Reference semantics reproduced (/root/reference/src/smart_pdf_md/config.py:
14-57 + cli.py:363-453):
- TOML/JSON config file; keys normalized (lowercased, `-`→`_`) EXCEPT inside
  the `[env]` table, whose keys keep their case (config.py:33-57).
- precedence: CLI flag > config key > built-in default (cli.py:469-594's
  ternaries — without the reference's latent `cast` NameError, cli.py:546,
  flagged in SURVEY §3.2 as do-not-replicate).
- unknown `[env]` keys warn against an allowlist unless suppressed
  (P5, cli.py:374-413).

The reference's env-var indirection (SMART_PDF_MD_* globals read at import
time) is deliberately NOT reproduced — it made stage-3 env application
reach only subprocess children (SURVEY §3.2 note); here config is an
explicit dict handed to the driver.
"""

from __future__ import annotations

import json
import sys
import tomllib
from dataclasses import dataclass, field
from pathlib import Path

KNOWN_KEYS = {
    "corpus", "corpus_size", "run_dir", "out", "master", "include", "exclude",
    "partitions", "link_threshold", "dry_run", "engine",
}
# env allowlist — the knobs the engine actually reads (P5 analogue of the
# reference's 21-key SMART_PDF_MD_* allowlist, cli.py:374-413)
KNOWN_ENV = {
    "KG_MOCK_FAIL", "KG_MOCK_FAIL_IF_CHUNK_GT", "SPARK_GRAFT_CPUS",
    "SPARK_GRAFT_DRIVER_MEM", "SPARK_GRAFT_MAX_PARTITION_BYTES",
    "SPARK_GRAFT_SF_DIR", "KG_BENCH_FILES",
}


@dataclass
class RunConfig:
    corpus: str | None = None
    corpus_size: int | None = None
    run_dir: str | None = None
    out: str | None = None
    master: str | None = None
    include: list[str] | None = None
    exclude: list[str] | None = None
    partitions: int | None = None
    link_threshold: float = 0.60
    dry_run: bool = False
    engine: str | None = None
    env: dict[str, str] = field(default_factory=dict)
    warnings: list[str] = field(default_factory=list)


def _normalize(d: dict) -> dict:
    """Lowercase + dash→underscore for config keys; `[env]` keys keep case."""
    out: dict = {}
    for k, v in d.items():
        nk = str(k).lower().replace("-", "_")
        if nk == "env" and isinstance(v, dict):
            out["env"] = {str(ek): str(ev) for ek, ev in v.items()}
        else:
            out[nk] = v
    return out


def load_config_file(path: str | Path) -> dict:
    """TOML (default) / JSON / YAML by extension — the same three formats the
    reference accepts (/root/reference/src/smart_pdf_md/config.py:33-57,
    `.yml`/`.yaml` at :43-48). YAML is gated on PyYAML being importable."""
    p = Path(path)
    raw = p.read_bytes()
    if p.suffix == ".json":
        return _normalize(json.loads(raw))
    if p.suffix in (".yml", ".yaml"):
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover - yaml ships in env
            raise RuntimeError(
                f"YAML config {p} requires PyYAML, which is not installed"
            ) from exc
        data = yaml.safe_load(raw.decode("utf-8")) or {}
        if not isinstance(data, dict):
            raise ValueError(f"YAML config {p} must be a mapping")
        return _normalize(data)
    return _normalize(tomllib.loads(raw.decode("utf-8")))


def merge_config(cli: dict, cfg: dict,
                 warn_unknown_env: bool = True) -> RunConfig:
    """CLI beats config beats defaults; collects P5-style warnings."""
    rc = RunConfig()
    warnings: list[str] = []
    for key in KNOWN_KEYS:
        cli_v = cli.get(key)
        cfg_v = cfg.get(key)
        # identity, not equality: 0 == False would make an explicit
        # `--partitions 0` / `--link-threshold 0.0` lose to the config file,
        # inverting CLI-beats-config precedence (ADVICE r1)
        v = cfg_v if (cli_v is None or cli_v is False) else cli_v
        if v is not None:
            setattr(rc, key, v)
    for k in cfg:
        if k not in KNOWN_KEYS and k != "env":
            warnings.append(f"unknown config key: {k}")
    # env: config [env] table overlaid by CLI -E KEY=VALUE (CLI wins —
    # reference cli.py:415-453 precedence)
    env = dict(cfg.get("env", {}))
    cli_env = cli.get("env") or {}
    env.update({str(k): str(v) for k, v in cli_env.items()})
    if warn_unknown_env:
        for k in env:
            if k.upper() not in KNOWN_ENV:
                warnings.append(f"unknown env key: {k}")
    rc.env = env
    rc.warnings = warnings
    for w in warnings:
        print(f"[WARN] {w}", file=sys.stderr)
    return rc
