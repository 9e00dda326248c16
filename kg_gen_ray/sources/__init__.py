from kg_gen_ray.sources.pages import (  # noqa: F401
    pages_from_documents,
    read_pages,
    synthetic_pages_table,
    write_synthetic_pages,
)
from kg_gen_ray.sources.graph_json import read_graph_json, write_graph_json  # noqa: F401
