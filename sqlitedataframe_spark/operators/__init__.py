"""Scale-oriented data-pipeline operators (north-star surface).

Everything here is expressed over DataFrame primitives (or Arrow-batched
Pandas UDFs where semantics require Python), so the operators inherit
Spark's distribution: no driver-side loops, no collect() in any hot path.
"""
