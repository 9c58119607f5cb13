"""Large-scale training-data pipeline operators (beyond reference parity).

- ``dedup``         exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
- ``similarity``    brute-force cosine top-k; LSH-bucketed ANN
- ``text_analysis`` language-ID, quality scoring, token counting, fingerprinting
- ``multimodal``    opaque binary columns + typed metadata, stubbed decoders

All hot paths are JVM built-in expressions (split / transform / aggregate /
higher-order functions); shuffles are keyed on bounded-cardinality blocking
keys (shingles, LSH bands, buckets) so the same plans survive a 100× scale-up.
"""
