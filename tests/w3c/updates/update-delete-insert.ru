DELETE { ?s <urn:p> "z" } INSERT { ?s <urn:p> "Z" } WHERE { ?s <urn:p> "z" }
