"""Genomics-domain operators demonstrated over the driver fixtures.

The reference's domain semantics (variant QC aggregation, allele
harmonization, dosage math) are pure functions of relational inputs, so we
exercise them on deterministic synthetic variant/genotype frames derived
from the fixture tables — the same trick as the reference's synthetic VCF
generators (tests/fixtures/vcf_generator.py).  Real VCF ingestion lives in
sources/vcf.py and is covered by pytest (no VCF fixtures in testdata).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
