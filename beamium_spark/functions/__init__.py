from beamium_spark.functions.labels import (  # noqa: F401
    add_labels,
    format_gts_line,
    labels_sorted_str,
    labels_to_str,
    parse_gts_line,
    remove_labels,
)
from beamium_spark.functions.transcompile import (  # noqa: F401
    transcompile_prometheus,
    transcompile_sensision,
    url_encode_rfc3986,
)
