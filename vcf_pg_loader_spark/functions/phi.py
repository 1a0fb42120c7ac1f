"""PHI header sanitization — the analytics-relevant slice of the
reference's compliance tooling (phi/header_sanitizer.py:62-121): regex
scrubbing of VCF header text before it is stored or logged.

Driver-side by design: headers are KBs and never enter the distributed
plan.  The broader HIPAA/auth machinery (reference cli.py:2419-7005) is
out of scope (SURVEY §7.0).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

PHI_PATTERNS: list[tuple[str, str]] = [
    (r"(?i)patient[_\s]?id\s*[=:]\s*\S+", "patient_id"),
    (r"(?i)mrn[_\s]?[=:]\s*\S+", "mrn"),
    (r"(?i)ssn[_\s]?[=:]\s*\S+", "ssn"),
    (r"(?i)dob[_\s]?[=:]\s*\S+", "dob"),
    (r"(?i)birth[_\s]?date[_\s]?[=:]\s*\S+", "birth_date"),
    (r"(?i)subject[_\s]?id\s*[=:]\s*\S+", "subject_id"),
    (r"(?i)accession[_\s]?[=:]\s*\S+", "accession"),
]

PATH_PATTERNS: list[tuple[str, str]] = [
    (r"/home/\w+/[^\s,\"']+", "unix_home_path"),
    (r"/Users/\w+/[^\s,\"']+", "macos_home_path"),
    (r"[A-Z]:\\\\Users\\\\[^\s,\"']+", "windows_home_path"),
    (r"/data/patients?/[^\s,\"']+", "patient_data_path"),
    (r"/clinical/[^\s,\"']+", "clinical_path"),
    (r"/PHI/[^\s,\"']+", "phi_path"),
]

DATE_PATTERNS: list[tuple[str, str]] = [
    (r"\d{3}-\d{2}-\d{4}", "ssn_format"),
    (r"\b\d{1,2}/\d{1,2}/\d{2,4}\b", "date_slash"),
    (r"\b\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}", "iso_datetime"),
    (r"\b\d{4}-\d{2}-\d{2}\b", "iso_date"),
]


@dataclass
class SanitizationResult:
    sanitized_header: str
    findings: list[dict] = field(default_factory=list)

    @property
    def risk_level(self) -> str:
        n = len(self.findings)
        if n == 0:
            return "low"
        if n < 5:
            return "medium"
        return "high"


def anonymize_sample_ids(
    samples: list[str], source_file: str
) -> dict[str, str]:
    """Stable pseudonymous IDs for sample names (reference
    phi/anonymizer.py:49-91 issues UUIDs via a vault table; here the ID
    is a deterministic UUIDv5-style digest of (sample, source_file) so
    repeat loads of the same file map identically — the same
    idempotent-reload property without a database)."""
    import hashlib
    import uuid

    out = {}
    for s in samples:
        digest = hashlib.sha256(f"{source_file}\x00{s}".encode()).digest()[:16]
        out[s] = str(uuid.UUID(bytes=digest))
    return out


def sanitize_header(
    header_text: str,
    remove_file_paths: bool = True,
    remove_dates: bool = True,
    custom_patterns: list[str] | None = None,
    replacement: str = "[REDACTED]",
) -> SanitizationResult:
    """Scrub PHI-looking content from VCF header lines."""
    patterns = list(PHI_PATTERNS)
    if remove_file_paths:
        patterns += PATH_PATTERNS
    if remove_dates:
        patterns += DATE_PATTERNS
    for p in custom_patterns or []:
        patterns.append((p, "custom"))

    findings: list[dict] = []
    out_lines = []
    for lineno, line in enumerate(header_text.splitlines(), start=1):
        for pat, name in patterns:
            for m in re.finditer(pat, line):
                findings.append({"line": lineno, "kind": name, "match": m.group()})
            line = re.sub(pat, replacement, line)
        out_lines.append(line)
    return SanitizationResult("\n".join(out_lines), findings)
