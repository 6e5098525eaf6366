from onto_text_tag_spark.functions.html_extract import strip_tags, extract_text_udf
from onto_text_tag_spark.functions.pluralize import plural

__all__ = ["strip_tags", "extract_text_udf", "plural"]
