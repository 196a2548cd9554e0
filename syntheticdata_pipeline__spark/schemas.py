"""Explicit StructType schemas for every record shape in the reference.

The reference is schema-on-read (dict literals at sink time); here every
dataset gets an explicit StructType (SURVEY.md §1.2). Citations point at the
reference files that imply each schema.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- product_metadata: data_pipeline/scrapers/any_scraper.py:764-774 -------
IMAGE_ENTRY = StructType(
    [
        _s("filename", StringType()),
        _s("url", StringType()),
        _s("size", StringType()),
        _s("index", IntegerType()),
        _s("s3_key", StringType()),
    ]
)

PRODUCT_METADATA = StructType(
    [
        _s("item_id", LongType()),
        _s("product_id", StringType()),
        _s("source", StringType()),
        _s("title", StringType()),
        _s("url", StringType()),
        _s("product_directory", StringType()),
        _s("images", ArrayType(IMAGE_ENTRY)),
        _s("total_images", IntegerType()),
        _s("scraped_at", TimestampType()),
        _s("storage", StringType()),
    ]
)

# --- vton_pair_metadata: vton_scraper/zalando_production_scraper.py:237-247 -
VTON_PAIR_METADATA = StructType(
    [
        _s("item_id", StringType()),
        _s("source", StringType()),
        _s("title", StringType()),
        _s("url", StringType()),
        _s("cloth_image", StringType()),
        _s("model_image", StringType()),
        _s("cloth_size", StringType()),
        _s("model_size", StringType()),
        _s("scraped_at", TimestampType()),
    ]
)

# --- progress_checkpoint: any_scraper.py:108-113 ----------------------------
PROGRESS_CHECKPOINT = StructType(
    [
        _s("items_scraped", LongType()),
        _s("scraped_urls", ArrayType(StringType())),
        _s("seen_image_hashes", ArrayType(StringType())),
        _s("last_updated", TimestampType()),
    ]
)

# --- prompt_jsonl: prompts_parser.py:54-57, AsyncImageGen/main.py:33-36 -----
PROMPT_JSONL = StructType(
    [
        _s("prompt_number", LongType()),
        _s("prompt", StringType()),
        _s("dress_name", StringType()),
        _s("setting", StringType()),
        # PERMISSIVE corrupt-record escape hatch (qwen_vl_processor.py:177-187
        # uses the same fallback idea for malformed model JSON).
        _s("_corrupt", StringType()),
    ]
)

# --- sampled_prompt: data_pipeline/utils/keyword_sampler.py:104-150 ---------
def _str_struct(*names: str) -> StructType:
    return StructType([_s(n, StringType()) for n in names])


SAMPLED_PROMPT = StructType(
    [
        _s("garment", _str_struct("type", "color", "material", "pattern", "surface_detail")),
        _s("fit", _str_struct("overall_fit", "length", "neckline", "waist", "cut_style")),
        _s(
            "observed_elements",
            _str_struct(
                "current_garment",
                "body_characteristics",
                "skin_tone",
                "pose_type",
                "camera_view",
                "visible_elements",
                "age_group",
                "gender",
                "body_shape",
            ),
        ),
        _s("scene", _str_struct("background", "lighting", "image_quality")),
        _s(
            "editing_actions",
            _str_struct(
                "primary_verb", "preservation_verb", "target_specification", "result_specification"
            ),
        ),
        _s("style_context", _str_struct("aesthetic", "occasion", "season")),
        _s("complexity", _str_struct("level", "example")),
    ]
)

# --- vl_analysis: data_pipeline/models/qwen_vl_processor.py:130-168,190-202 -
VL_ANALYSIS = StructType(
    [
        _s(
            "source",
            StructType(
                [
                    _s("person_image", StringType()),
                    _s("clothing_images", ArrayType(StringType())),
                ]
            ),
        ),
        _s(
            "vl_analysis",
            StructType(
                [
                    _s(
                        "person_analysis",
                        StructType(
                            [
                                _s("body_shape", StringType()),
                                _s("skin_tone", StringType()),
                                _s("pose", StringType()),
                                _s("standing_position", StringType()),
                                _s("arm_position", StringType()),
                                _s("visible_characteristics", ArrayType(StringType())),
                            ]
                        ),
                    ),
                    _s("current_clothing", _str_struct("type", "fit", "color", "material", "style")),
                    _s("target_clothing", _str_struct("type", "fit", "color", "material", "style")),
                    _s(
                        "transition_notes",
                        _str_struct(
                            "fit_changes", "fabric_drape", "color_harmony", "style_compatibility"
                        ),
                    ),
                    _s("edit_instructions", ArrayType(StringType())),
                    _s("edit_strength", StringType()),
                    _s("confidence_score", DoubleType()),
                    _s("feasibility", StringType()),
                ]
            ),
        ),
        _s("edit_prompt_for_model", StringType()),
        _s("metadata", _str_struct("model", "task", "output_type")),
    ]
)

# Fallback struct for unparseable model output (qwen_vl_processor.py:184-187).
RAW_RESPONSE_FALLBACK = StructType([_s("raw_response", StringType())])

# --- dataset_index: data_pipeline/utils/image_utils.py:55-68 ----------------
DATASET_INDEX = StructType(
    [
        _s(
            "images",
            ArrayType(
                StructType(
                    [_s("filename", StringType()), _s("path", StringType()), _s("size", LongType())]
                )
            ),
        ),
        _s("total_count", LongType()),
        _s("directory", StringType()),
    ]
)

# --- run_stats: test_kimono.py:63-74 ----------------------------------------
RUN_STATS = StructType(
    [
        _s("run_id", StringType()),
        _s("total_pages_explored", LongType()),
        _s("total_products_found", LongType()),
        _s("total_products_explored", LongType()),
        _s("successful_scrapes", LongType()),
        _s("failed_scrapes", LongType()),
        _s("skipped_already_scraped", LongType()),
        _s("total_images_downloaded", LongType()),
        _s("start_time", TimestampType()),
        _s("end_time", TimestampType()),
    ]
)

# --- accessibility_probe: data_pipeline/tests/test_scraper_requests.py:49-56 -
ACCESSIBILITY_PROBE = StructType(
    [
        _s("category", StringType()),
        _s("url", StringType()),
        _s("status", StringType()),
        _s("reason", StringType()),
        _s("images_found", IntegerType()),
    ]
)

# --- image_asset: image_utils.py:12-35 + any_scraper.py:267-330 -------------
IMAGE_ASSET = StructType(
    [
        _s("path", StringType()),
        _s("width", IntegerType()),
        _s("height", IntegerType()),
        _s("bytes_len", LongType()),
        _s("content_type", StringType()),
        _s("head_bytes", StringType()),
        _s("ok", BooleanType()),
    ]
)

# --- weighted dict rows: easy_dict.py:1-29, keywords_dictionary.py:3-45 -----
WEIGHTED_FLAT_TIER = StructType(
    [
        _s("category", StringType()),
        _s("prob", DoubleType()),
        _s("items", MapType(StringType(), DoubleType())),
    ]
)

WEIGHTED_LEAF = StructType(
    [
        _s("path", ArrayType(StringType())),
        _s("prob", DoubleType()),
        _s(
            "keywords",
            ArrayType(StructType([_s("name", StringType()), _s("weight", DoubleType())])),
        ),
    ]
)

# --- driver testdata tables (FIXTURES.md §A), for schema assertions ---------
EVENTS = StructType(
    [
        _s("event_id", LongType()),
        _s("ts", TimestampType()),
        _s("user_id", LongType()),
        _s("event_type", StringType()),
        _s("value", DoubleType()),
        _s("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        _s("doc_id", LongType()),
        _s("text", StringType()),
        _s("lang", StringType()),
        _s("source", StringType()),
        _s("n_chars", LongType()),
    ]
)
