from kg_gen_ray.pipelines.kg_pipeline import (  # noqa: F401
    build_kg,
    raw_triples,
    KGResult,
)
