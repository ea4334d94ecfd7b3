from tokcodec.sources.reader import TokbReader, read_decoded  # noqa: F401
