"""Sources & sinks: the connector surface the reference lacks entirely
(its I/O is in-memory ReadingSet handoff, ``plugin.cpp:226-228``) but a
standalone engine needs."""
