"""Build/query plans: Indexer, Searcher, config composition, manifests."""
