from .parity import (
    merge_metadata_dbs,
    synthetic_part_filenames,
    update_new_files,
    variant_report,
    variant_report_flat,
    with_parsed_title,
)

__all__ = [
    "merge_metadata_dbs",
    "synthetic_part_filenames",
    "update_new_files",
    "variant_report",
    "variant_report_flat",
    "with_parsed_title",
]
