from .registry import QueryDef, all_queries, oracle_map, query  # noqa: F401
