WITH <urn:g1> DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p> "w" } WHERE { ?s <urn:p> ?o }
