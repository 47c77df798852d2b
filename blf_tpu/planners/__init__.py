"""Host-side planning: contact timelines, convex hulls, variables registry."""
