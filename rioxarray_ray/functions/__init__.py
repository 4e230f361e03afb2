"""Training-data pipeline operators (dedup / similarity / text analysis)
over generic document + embedding tables — first-class engine components
alongside the raster operators (build brief: 'beyond the reference')."""
