"""Operator library: one module per capability area.

- relational: map/filter/union/join/agg/sort/topk (SURVEY §2.3, §2.6, §2.9)
- stateful:   per-key running concatenation (SURVEY §2.5 F1)
- windows:    event-time tumbling/sliding/session windows + max_by (§2.7)
- dedup:      exact + near-duplicate detection (north-star extension)
- similarity: embedding similarity search (north-star extension)
- text:       language-ID, quality, tokens, fingerprints (extension)
- anomaly:    z-score / windowed anomaly detection (the reference's title)
- multimodal: binary-column plumbing with stubbed decoders (extension)
"""
