from information_extraction_spark.fixtures.generator import (  # noqa: F401
    World,
    build_world,
    compute_golden,
    generate_transcripts,
    write_fixtures,
)
