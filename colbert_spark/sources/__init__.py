"""Sources & sinks: collection/queries/qrels/ranking IO, synthetic corpus,
index segment storage."""
