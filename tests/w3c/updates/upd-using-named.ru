INSERT { ?s <urn:q> ?o } USING NAMED <urn:g2> WHERE { GRAPH ?g { ?s <urn:p> ?o } }
