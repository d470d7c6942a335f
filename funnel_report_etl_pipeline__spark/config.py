"""Config sources (reference S6/S7): env settings + recipients map.

Control-plane only — these never touch the data path. The Drill host/port
of the reference (report_engine.py:22-41) is replaced by the data base
path the Spark readers scan directly; SMTP/output settings carry over
unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SmtpConfig:
    from_addr: str = ""
    host: str = "smtp.example.com"
    port: int = 587
    user: str = ""
    password: str = ""
    # STARTTLS as the reference does (run_reports.py:158); switchable off
    # so tests can drive the full send path against a plaintext local stub.
    use_tls: bool = True

    @property
    def configured(self) -> bool:
        return bool(self.user and self.password)


@dataclass(frozen=True)
class EngineConfig:
    """≙ reference load_config (report_engine.py:22-41), minus the Drill
    REST endpoint: Spark reads the landing zone directly, so only the base
    path survives."""

    data_base_path: str = "/data/user-funnel"
    output_dir: str = "./output"
    smtp: SmtpConfig = field(default_factory=SmtpConfig)


def load_config() -> EngineConfig:
    """Env (and .env when python-dotenv is present) → EngineConfig."""
    try:
        from dotenv import load_dotenv

        load_dotenv()
    except ImportError:
        pass
    return EngineConfig(
        data_base_path=os.environ.get("DATA_BASE_PATH")
        or os.environ.get("DRILL_DATA_BASE", "/data/user-funnel"),
        output_dir=os.environ.get("OUTPUT_DIR", "./output"),
        smtp=SmtpConfig(
            from_addr=os.environ.get("SMTP_FROM", ""),
            host=os.environ.get("SMTP_HOST", "smtp.example.com"),
            port=int(os.environ.get("SMTP_PORT", "587")),
            user=os.environ.get("SMTP_USER", ""),
            password=os.environ.get("SMTP_PASSWORD", ""),
        ),
    )


def load_recipients(path: str = "recipients.json") -> tuple[dict, dict, list[str]]:
    """entity → To/CC recipient maps (reference run_reports.py:50-57).

    Returns (to_map, cc_map, default_cc)."""
    with open(path) as f:
        data = json.load(f)
    to_map = data.get("to", {})
    cc_map = data.get("cc", {})
    default_cc = cc_map.get("default", ["cc@your-company.com"])
    return to_map, cc_map, default_cc
