"""Partition-invariance sweep (r8 discipline): the round-9 queries
must produce identical normalized results at different parallelism
configs — catches fp-agg-order, collect-order, and the mono_id
two-branch hazard."""
import subprocess, sys, json

QUERIES = ["q189_exif_audit"] + [
    "q194_pdf_fonts", "q195_xlsx_cells", "q196_pptx_text",
    "q197_revisit_resolve", "q198_coding_audit", "q199_langid_trained",
    "q200_pdf_provenance", "q201_contamination", "q202_markdown_extract",
    "q203_feed_scan", "q204_mixture_sample", "q205_jsonld_extract",
    "q206_mixed_corpus5", "q207_politeness_schedule", "q208_anchor_text",
    "q209_nfc_audit", "q210_excel_dates", "q211_pdf_cid_text",
    "q212_langid_route", "q213_redirect_chains", "q214_sitemap_index",
    "q215_mime_sniff", "q216_canonical_cluster", "q217_noindex_gate",
    "q218_c4_filters", "q219_rendezvous_shard", "q220_lang_attr_audit",
    "q221_perplexity_buckets", "q222_recrawl_plan", "q223_tiff_decode",
    "q224_blocklist_filter", "q225_line_repetition", "q226_code_routing",
    "q227_compliance_pipeline", "q228_request_pairing",
    "q229_pdf_encryption_audit", "q230_decode_quality",
    "q231_token_fertility", "q232_minhash_error",
    "q233_hreflang_clusters", "q234_frontier_signals",
    "q235_domain_report",
    "q236_license_detect", "q237_secret_scan", "q238_zorder_layout",
    "q239_eml_scan", "q240_wikitext", "q241_bitext_align",
    "q242_csv_sniff", "q243_code_governance",
    "q244_pca_power", "q245_ddsketch",
    "q246_stream_ddsketch", "q247_crawl_budget", "q248_hilbert_layout",
    "q249_jpeg_quality", "q250_crawl_bootstrap", "q251_tar_scan",
    "q252_hll_intersection", "q253_webdataset", "q254_compaction_plan",
    "q255_data_profile", "q256_bloom_join_prune", "q257_stream_late_drop",
    "q258_graph_hits", "q259_scd2_intervals", "q260_funnel",
    "q261_retention", "q262_forward_fill", "q263_disorder_audit",
    "q264_fk_conformance", "q265_zip_scan", "q266_stream_left_outer",
    "q267_cdc_apply", "q268_record_linkage", "q269_grid_dbscan",
    "q270_track_interpolate",
]

SNIPPET = """
import sys, hashlib
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession
from oracle import _normalized_rows
spark = (SparkSession.builder.master("local[{cores}]")
         .config("spark.sql.shuffle.partitions", "{parts}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
qs = E.queries()
out = {{}}
for name in {queries!r}:
    df = qs[name](spark, "/root/testdata/sf0.01")
    rows = _normalized_rows(df.columns, [tuple(r) for r in df.collect()])
    out[name] = hashlib.md5(repr(rows).encode()).hexdigest()
import json; print("HASHES " + json.dumps(out))
"""

results = {}
for cores, parts in ((2, 3), (8, 8), (16, 64)):
    r = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(cores=cores, parts=parts, queries=QUERIES)],
        capture_output=True, text=True, timeout=900,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("HASHES ")]
    assert line, r.stdout[-2000:] + r.stderr[-2000:]
    results[(cores, parts)] = json.loads(line[0][7:])

base = results[(8, 8)]
bad = []
for cfg, h in results.items():
    for q in QUERIES:
        if h[q] != base[q]:
            bad.append((cfg, q))
print("MISMATCHES:", bad if bad else "none — invariant at all 3 configs")
