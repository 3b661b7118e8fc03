from .names import snake_case
from .numeric import dec, div_avg, one_dec
from .hashing import md5_long, DUCKDB_MD5_LONG

__all__ = ["snake_case", "one_dec", "dec", "div_avg", "md5_long", "DUCKDB_MD5_LONG"]
