from streaming_examples_spark.model.envelope import (
    OP_CREATE,
    OP_DELETE,
    OP_READ,
    OP_UPDATE,
    data_change_event_schema,
    transaction_event_schema,
)
from streaming_examples_spark.model.decoders import (
    decimal_from_string,
    date_from_epoch_days,
    parse_tx_id,
    timestamp_from_epoch_micros,
)

__all__ = [
    "OP_CREATE",
    "OP_READ",
    "OP_UPDATE",
    "OP_DELETE",
    "data_change_event_schema",
    "transaction_event_schema",
    "decimal_from_string",
    "date_from_epoch_days",
    "timestamp_from_epoch_micros",
    "parse_tx_id",
]
