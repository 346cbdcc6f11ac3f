from wned_ray.sources.readers import (read_alias_tsv, read_doc_dump,
                                      read_edges_tsv, read_jsonl,
                                      read_text_dir)

__all__ = ["read_alias_tsv", "read_edges_tsv", "read_text_dir",
           "read_doc_dump", "read_jsonl"]
