from warcbase_spark.functions import matchbox, text, urls  # noqa: F401
