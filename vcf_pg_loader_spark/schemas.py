"""Schema system: VCF header types → Spark types, and the variants schema.

Mirrors the reference's type mapping (type_mapping.py:4-26) and the
variants fact table (schema.py:110-187, models.py:7-88), columnar-first:
the INFO dict becomes a map<string,string> column (the JSONB analogue)
plus typed extracted columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# VCF (Type, Number) -> Spark type (reference type_mapping.py:4-26).
# Number '1'/'0' scalar; A/R/G/. and N>1 become arrays.
_SCALAR = {
    "Integer": T.IntegerType(),
    "Float": T.FloatType(),
    "String": T.StringType(),
    "Character": T.StringType(),
    "Flag": T.BooleanType(),
}


def vcf_type_to_spark(vcf_type: str, number: str) -> T.DataType:
    """Map a VCF header (Type, Number) pair to a Spark type."""
    base = _SCALAR.get(vcf_type, T.StringType())
    if vcf_type == "Flag" or number == "0":
        return T.BooleanType()
    if number == "1":
        return base
    # A, R, G, '.', or a fixed N>1 → array of base type
    try:
        if int(number) == 1:
            return base
    except ValueError:
        pass
    return T.ArrayType(base)


# The variants fact table (reference schema.py:110-187 / models.py:7-88).
VARIANTS_SCHEMA = T.StructType(
    [
        T.StructField("chrom", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("end_pos", T.LongType(), True),
        T.StructField("ref", T.StringType(), False),
        T.StructField("alt", T.StringType(), False),
        T.StructField("qual", T.FloatType(), True),
        T.StructField("filter", T.ArrayType(T.StringType()), True),
        T.StructField("variant_type", T.StringType(), True),
        T.StructField("rs_id", T.StringType(), True),
        T.StructField("info", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("gene", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("consequence", T.StringType(), True),
        T.StructField("impact", T.StringType(), True),
        T.StructField("hgvs_c", T.StringType(), True),
        T.StructField("hgvs_p", T.StringType(), True),
        T.StructField("af_gnomad", T.FloatType(), True),
        T.StructField("cadd_phred", T.FloatType(), True),
        T.StructField("clinvar_sig", T.StringType(), True),
        T.StructField("clinvar_sig_raw", T.StringType(), True),
        T.StructField("is_coding", T.BooleanType(), True),
        T.StructField("is_lof", T.BooleanType(), True),
        T.StructField("normalized", T.BooleanType(), True),
        T.StructField("needs_left_extension", T.BooleanType(), True),
        T.StructField("original_pos", T.LongType(), True),
        T.StructField("original_ref", T.StringType(), True),
        T.StructField("original_alt", T.StringType(), True),
        T.StructField("info_score", T.FloatType(), True),
        T.StructField("is_imputed", T.BooleanType(), True),
        T.StructField("is_typed", T.BooleanType(), True),
        T.StructField("in_hapmap3", T.BooleanType(), True),
        T.StructField("hapmap3_rsid", T.StringType(), True),
        T.StructField("load_batch_id", T.StringType(), True),
    ]
)
