"""Scalar/vector function library: text hashing & sketches (minhash,
simhash, shingles), language-id heuristics, quality scores. All
deterministic; hot paths vectorized numpy."""
